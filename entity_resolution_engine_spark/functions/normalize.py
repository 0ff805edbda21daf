"""Canonical text extraction + name normalization.

The per-row invariant (BASELINE.json input_hint): the canonical text
extracted for each url must be byte-identical between the engine's
distributed path (pandas UDF on executors) and the reference extractor
run directly in Python.  To make that invariant structural rather than
incidental, exactly ONE pure-Python implementation of each transform
lives in this module; the Spark pandas UDFs and the pytest oracle both
import it.  Tests verify byte equality per row (tests/test_normalize.py).

Semantics follow the reference normalizer pipeline
(/root/reference/entity_resolution_engine/normalizers/name_normalizer.py:14-26):
NFKD decomposition → strip combining marks → lower/strip →
non-[\\w\\s] → space → whitespace collapse.  (The reference's
sports-specific alias rewrite "fc → football club",
name_normalizer.py:9-11, has no analog for web pages and is exposed
separately as ``apply_aliases`` for parity tests.)
"""

from __future__ import annotations

import html as _htmllib
import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType
from pyspark.sql import Column

_PUNCT_RE = re.compile(r"[^\w\s]")
_WS_RE = re.compile(r"\s+")
_TAG_RE = re.compile(r"<[^>]*>")
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_HEAD_RE = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.IGNORECASE | re.DOTALL)


# ---------------------------------------------------------------------------
# Pure-Python reference implementations (the single source of truth)
# ---------------------------------------------------------------------------

def extract_text(html_bytes: bytes | None) -> str:
    """HTML → visible text: drop script/style blocks, strip tags,
    unescape entities, collapse whitespace.

    Deterministic and dependency-free (no bs4/lxml in this image); the
    synthetic corpus wraps text in well-formed boilerplate so regex
    stripping is exact for it, and the function is total on arbitrary
    bytes (lenient utf-8 decode).
    """
    if html_bytes is None:
        return ""
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _HEAD_RE.sub(" ", raw)
    raw = _SCRIPT_STYLE_RE.sub(" ", raw)
    raw = _TAG_RE.sub(" ", raw)
    raw = _htmllib.unescape(raw)
    return _WS_RE.sub(" ", raw).strip()


def normalize_text(text: str | None) -> str:
    """Match-key normalization (reference name_normalizer.py:14-26
    semantics, minus the sports alias table)."""
    if not text:
        return ""
    if text.isascii():
        # NFKD is the identity on ASCII and ASCII has no combining
        # marks, so the per-character decompose/strip loop — measured
        # ~3ms/doc, the normalize stage's dominant cost (round 6) —
        # is a no-op; str.isascii() is a C-level check.  Byte-identical
        # output either way (pinned by tests/test_normalize.py).
        s = text
    else:
        s = unicodedata.normalize("NFKD", text)
        s = "".join(ch for ch in s if not unicodedata.combining(ch))
    s = s.lower().strip()
    s = _PUNCT_RE.sub(" ", s)
    return _WS_RE.sub(" ", s).strip()


def apply_aliases(text: str, aliases: list[tuple[str, str]] | None = None) -> str:
    """Configurable word-boundary alias rewrite; default table mirrors
    the reference's single rule (name_normalizer.py:9-11) so parity
    tests can check it verbatim."""
    rules = aliases if aliases is not None else [(r"\bfc\b", "football club")]
    out = text
    for pat, repl in rules:
        out = re.sub(pat, repl, out)
    return _WS_RE.sub(" ", out).strip()


def canonical_text(html_bytes: bytes | None, text: str | None) -> str:
    """The flagship extractor: prefer the html payload when present,
    fall back to the pre-extracted text column; whitespace-canonical."""
    if html_bytes:
        return extract_text(html_bytes)
    if text:
        return _WS_RE.sub(" ", text).strip()
    return ""


def url_domain(url: str | None) -> str:
    """scheme://host/... → host (lowered, port stripped)."""
    if not url:
        return ""
    s = url
    idx = s.find("://")
    if idx >= 0:
        s = s[idx + 3 :]
    for sep in ("/", "?", "#"):
        cut = s.find(sep)
        if cut >= 0:
            s = s[:cut]
    s = s.lower()
    if "@" in s:
        s = s.rsplit("@", 1)[1]
    if ":" in s:
        s = s.split(":", 1)[0]
    return s


# ---------------------------------------------------------------------------
# Arrow-batched pandas UDFs (executor path)
# ---------------------------------------------------------------------------

@F.pandas_udf(StringType())
def canonical_text_udf(html_s: pd.Series, text_s: pd.Series) -> pd.Series:
    return pd.Series(
        [canonical_text(h, t) for h, t in zip(html_s, text_s)], dtype="object"
    )


@F.pandas_udf(StringType())
def normalize_text_udf(text_s: pd.Series) -> pd.Series:
    return text_s.map(normalize_text).astype("object")


def domain_col(url: Column) -> Column:
    """Domain extraction as a pure-JVM expression (no Python): mirrors
    ``url_domain`` for http(s) urls — the only scheme in the corpus.
    Byte-parity with the Python function is pinned in tests."""
    host = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    host = F.regexp_extract(host, r"^([^/?#]*)", 1)
    host = F.element_at(F.split(host, "@"), -1)
    host = F.element_at(F.split(host, ":"), 1)
    return F.lower(host)
