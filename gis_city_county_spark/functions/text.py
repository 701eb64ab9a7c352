"""Scalar string expression builders — the reference's "UDF surface".

The reference ships per-row Python source strings into ArcGIS's
embedded interpreter via ``CalculateField`` (reference
``bunny.py:45-61``, ``bunny.py:79-101``). None of that logic needs a
Python UDF on Spark: every function here returns a JVM-side ``Column``
expression that Catalyst folds into whole-stage codegen, so the
per-row cost is native and the expressions pipeline with filters and
joins without a serialization boundary.

Mapping to the reference (SURVEY.md §2.3):

- F1 ``split_name``      → :func:`drop_first_words`
- F4 last-word+capitalize → :func:`last_word_title`
- F5 ``place_name``      → :func:`drop_last_word`
- F6 ``type_id`` GEOID   → :func:`zero_pad_concat`
- F7 ``strip_extra``     → :func:`strip_tokens`
- F10 ``'' → NULL``      → :func:`nullif_empty`
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def drop_first_words(col: Column | str, n: int) -> Column:
    """Drop the first ``n`` whitespace-delimited words.

    Reference F1 (``bunny.py:45-61``): ``name.split(" ", 2)[2]`` drops
    the leading "City of" / "Town of" prefix. ``split`` with a limit
    keeps the remainder intact in the last element.
    """
    c = _c(col)
    # try_element_at: NULL (not an ANSI error) when the string has
    # fewer than n+1 words — matches the reference's IndexError-free
    # branch structure.
    return F.try_element_at(F.split(c, " ", n + 1), F.lit(n + 1))


def drop_last_word(col: Column | str) -> Column:
    """Drop the final whitespace-delimited word (reference F5,
    ``bunny.py:127-140``: ``area.rsplit(" ", 1)[0]``)."""
    c = _c(col)
    return F.regexp_replace(c, r" [^ ]+$", "")


def last_word_title(col: Column | str) -> Column:
    """Capitalize the last word (reference F4, ``bunny.py:121-125``:
    ``Area_Name.split()[-1].capitalize()``). The extracted value is a
    single word, so ``initcap`` equals Python's ``.capitalize()``."""
    c = _c(col)
    return F.initcap(F.element_at(F.split(c, " "), -1))


def zero_pad_concat(parts: Sequence[tuple[Column | str, int]]) -> Column:
    """Zero-padded fixed-width concat (reference F6, ``bunny.py:142-155``:
    ``f"{state:02}{county:03}"`` GEOID construction)."""
    cols = [F.lpad(_c(c).cast("string"), width, "0") for c, width in parts]
    return F.concat(*cols)


def strip_tokens(col: Column | str, tokens: Sequence[str]) -> Column:
    """Remove each literal token (reference F7, ``bunny.py:405-420``:
    chained ``.replace('City of ','')`` etc.)."""
    c = _c(col)
    for t in tokens:
        c = F.replace(c, F.lit(t), F.lit(""))
    return c


def nullif_empty(col: Column | str) -> Column:
    """Normalize empty string to NULL (reference F10,
    ``coastline.py:66``). The reference distinguishes ``''`` from NULL
    throughout (SURVEY.md §2.2 P2) — this is the explicit conversion
    point."""
    c = _c(col)
    return F.nullif(c, F.lit(""))
