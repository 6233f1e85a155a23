"""Go-compatible text cleaning (kernel F12, SURVEY.md §2.8).

The reference cleans every extracted text node with
``stringsx.Clean`` from icza/gox (/root/reference/linkNodeParsing.go:119),
which removes every rune for which Go's ``unicode.IsGraphic`` returns
false (i.e. keeps Unicode categories L, M, N, P, S and Zs — letters,
marks, numbers, punctuation, symbols and *space separators*; drops
control chars incl. ``\\n``/``\\t``/``\\r``, format chars, Zl, Zp,
surrogates, unassigned).

This feeds the byte-identical-extracted-text invariant
(BASELINE.json input_hint), so the semantics here are pinned by
golden tests (tests/test_textclean.py) and must not drift.
"""

from __future__ import annotations

import unicodedata


class _CleanTable(dict):
    """str.translate table: keep graphic runes, delete the rest.

    Lazily classifies each distinct code point once; str.translate
    then runs at C speed per string, so cleaning inside a pandas UDF
    is vectorized-ish (no per-row Python beyond the translate call).
    """

    def __missing__(self, cp: int) -> int | None:
        ch = chr(cp)
        cat = unicodedata.category(ch)
        keep = cat[0] in "LMNPS" or cat == "Zs"
        res = cp if keep else None
        self[cp] = res
        return res


_TABLE = _CleanTable()


def go_clean(s: str) -> str:
    """Bit-exact Python equivalent of gox ``stringsx.Clean``."""
    return s.translate(_TABLE)


def is_graphic(ch: str) -> bool:
    """Go ``unicode.IsGraphic`` for a single character."""
    cat = unicodedata.category(ch)
    return cat[0] in "LMNPS" or cat == "Zs"
