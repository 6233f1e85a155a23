"""Pin stringsx.Clean semantics (F12) — feeds the byte-identical
text invariant; these goldens must never drift."""

from notjusthtml_searchengine_spark.functions.textclean import go_clean, is_graphic


def test_control_chars_removed():
    assert go_clean("a\nb\tc\rd\x00e\x1bf") == "abcdef"


def test_spaces_kept():
    # Zs (space) is graphic in Go's unicode.IsGraphic; \n\t are Cc.
    assert go_clean("  a  b \n c ") == "  a  b  c "


def test_nbsp_kept_zwsp_removed():
    assert go_clean("a b") == "a b"  # NBSP is Zs → kept
    assert go_clean("a\u200bb") == "ab"  # zero-width space is Cf → removed
    assert go_clean("a\u2028b") == "ab"  # line separator Zl → removed
    assert go_clean("a\u2029b") == "ab"  # paragraph separator Zp → removed


def test_letters_marks_numbers_punct_symbols_kept():
    s = "Größe-日本語, №42 €∑ á"
    assert go_clean(s) == s


def test_delete_char_removed():
    assert go_clean("x\x7fy") == "xy"


def test_is_graphic_matches_go_categories():
    assert is_graphic(" ")
    assert is_graphic("€")
    assert not is_graphic("\n")
    assert not is_graphic("\u200b")
