"""Mojibake repair: undo UTF-8-read-as-CP1252 double encoding.

The most common text corruption in web corpora: a page's UTF-8 bytes
get decoded as CP1252/Latin-1 somewhere in the pipeline and
re-encoded, so ``é`` ships as ``Ã©``, ``—`` as ``â€”``, ``©`` as
``Â©``. Crawl-scale corpora carry millions of such documents; ftfy
exists for exactly this. Two repair surfaces:

- :func:`fix_mojibake_text` — the Python kernel: detects the
  signature lead bytes and applies the full
  ``encode('cp1252') → decode('utf-8')`` round trip (iterated, so
  double-mojibake also unwinds). Handles EVERY character, not just an
  inventory; runs per Arrow batch via :func:`repair_mojibake`
  (mapInPandas).
- :func:`repair_expr` / :func:`repair_sql` — a pure-JVM / DuckDB
  replace chain over a FROZEN inventory of the ~70 most common
  sequences (generated from the character list below, never
  hand-typed, so the two engines and the kernel can't drift). This is
  the oracle-replayable scale path: chained ``replace`` stays inside
  whole-stage codegen — one scan, zero shuffle, zero Python.

The inventory chain is collision-free by construction (no sequence is
a substring of another — asserted in tests), and its frozen order
(sorted by repaired codepoint) unwinds double-mojibake too: the inner
sequences ('Ãƒ' → 'Ã', 'Â©' → '©') sort before the outer ('Ã©' → 'é'),
so one pass over the chain repairs both levels. A differential test
pins kernel == chain on inventory-only corruption, including the
double-encoded case.

Reference parity: none (the OCR queue never touches encodings beyond
fs defaults); beyond-reference webtext surface.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: frozen repair inventory: the Latin/Western characters that dominate
#: real-world mojibake (accented letters, typographic punctuation,
#: currency/legal marks). The sequence for each is COMPUTED as
#: char.encode('utf-8').decode('cp1252') — never hand-typed.
REPAIR_CHARS = (
    "áàâäãåæçéèêëíìîïñóòôöõøúùûüýÿß"
    "ÁÀÂÄÃÅÆÇÉÈÊËÍÌÎÏÑÓÒÔÖÕØÚÙÛÜ"
    "–—‘’“”…•€°©®™«»´¨¿¡½¼¾·±×÷"
)

#: bytes 0x80-0x9F have no CP1252 mapping for 5 positions (0x81, 0x8D,
#: 0x8F, 0x90, 0x9D); chars whose UTF-8 encoding hits one of those
#: can't round-trip and are excluded at table-build time.


def _sequence_for(ch: str) -> str | None:
    try:
        return ch.encode("utf-8").decode("cp1252")
    except UnicodeDecodeError:
        return None


def build_repair_table() -> list[tuple[str, str]]:
    """(mojibake_sequence, repaired_char) pairs in frozen order
    (sorted by repaired codepoint) — the ONE table all three repair
    surfaces derive from."""
    out = []
    for ch in sorted(set(REPAIR_CHARS)):
        seq = _sequence_for(ch)
        if seq is not None and len(seq) > 1:
            out.append((seq, ch))
    return out


_REPAIR_TABLE = build_repair_table()

#: lead characters whose presence marks likely mojibake — the CP1252
#: images of UTF-8 lead bytes used by the inventory ('Ã'/'Â' for
#: 2-byte chars, bare 'â' for the 3-byte E2 block: '€' mojibakes to
#: 'â‚¬', which never contains 'â€'). A genuine 'â' (pâte) is safe:
#: its cp1252 bytes are not valid UTF-8, so the round trip fails and
#: the text returns intact.
_MARKERS = ("Ã", "Â", "â", "Å", "Æ")


# ---------------------------------------------------------------- kernel

def fix_mojibake_text(s: str | None, max_rounds: int = 2) -> str | None:
    """Full-fidelity repair: cp1252-encode / utf-8-decode round trip,
    iterated while the text still looks corrupted (double-mojibake
    unwinds in two rounds). Strings that fail the round trip (genuine
    CP1252 text that merely resembles mojibake) are returned as-is —
    the repair never throws and never loses data."""
    if s is None:
        return None
    for _ in range(max_rounds):
        if not any(m in s for m in _MARKERS):
            return s
        try:
            repaired = s.encode("cp1252").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return s
        if repaired == s:
            return s
        s = repaired
    return s


def repair_mojibake(docs: DataFrame, text_col: str = "text",
                    out_col: str = "text") -> DataFrame:
    """Arrow-batched kernel repair over a DataFrame (mapInPandas-free:
    uses a pandas-vectorized transform inside mapInPandas so Spark
    sees one Python stage)."""
    import pandas as pd  # noqa: F401

    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    docs = widen_if_narrow(docs)
    fields = ", ".join(
        f"{c} {t}" if c != text_col else f"{out_col} string"
        for c, t in docs.dtypes
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for b in batches:
            b = b.copy()
            fixed = b[text_col].map(fix_mojibake_text)
            if out_col != text_col:
                b = b.rename(columns={text_col: out_col})
            b[out_col] = fixed
            yield b

    return docs.mapInPandas(run, fields)


# ------------------------------------------------------------- JVM / SQL

def repair_expr(col: str | Column) -> Column:
    """Inventory repair as a chained-replace JVM expression."""
    c = F.col(col) if isinstance(col, str) else col
    for seq, ch in _REPAIR_TABLE:
        c = F.replace(c, F.lit(seq), F.lit(ch))
    return c


def mojibake_score(col: str | Column) -> Column:
    """How corrupted is this text? Characters recovered by the
    inventory repair (0 = clean). Cheap pre-filter: route only rows
    with score > 0 to the kernel pass at scale."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - F.length(repair_expr(c))).cast("int")


def repair_sql(expr: str) -> str:
    """The identical chain as a DuckDB fragment (sequences embedded as
    UTF-8 literals; none contains an ASCII quote by construction —
    CP1252 images of bytes ≥ 0x80 only)."""
    out = expr
    for seq, ch in _REPAIR_TABLE:
        out = f"replace({out}, '{seq}', '{ch}')"
    return out


def planted_mojibake_expr(dialect: str) -> str:
    """Dialect-neutral fragment corrupting documents rows with known
    mojibake (doc_id-keyed variety, incl. a clean row and a
    double-encoded token) for the registry oracle."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect!r}")
    cafe = _sequence_for("é")
    dash = _sequence_for("—")
    copy = _sequence_for("©")
    # double-encoded é: mojibake the mojibake
    double = "".join(
        _sequence_for(ch) or ch for ch in cafe  # type: ignore[union-attr]
    )
    return (
        "CASE "
        f"WHEN doc_id % 4 = 1 THEN substr(text, 1, 60) || ' caf{cafe} "
        f"na{_sequence_for('ï')}ve {copy}2024' "
        f"WHEN doc_id % 4 = 2 THEN substr(text, 1, 60) || ' a {dash} b' "
        f"WHEN doc_id % 4 = 3 THEN substr(text, 1, 60) || ' caf{double}' "
        "ELSE substr(text, 1, 60) END"
    )
