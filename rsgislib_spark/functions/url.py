"""URL normalization + PII scrubbing for the web-scale pipeline.

The input_hint's table is keyed by ``url`` — any Common-Crawl-style
pipeline needs host extraction / normalization before per-host
policies (crawl budgets, dedup scopes, robots buckets), and PII
redaction (emails, IPv4s) before text ships to training. RSGISLib has
no text ops; these are pipeline-first-class additions alongside
functions/text.py.

Everything is a shared-SQL builder (the text.py discipline): one SQL
string evaluated by BOTH Spark (via F.expr) and the DuckDB oracle, so
the correctness gate checks the identical expression. All pure
codegen — at 100 TB these run at scan speed, zero Python, zero
shuffle until the (tiny, per-host) rollup aggregation.

Engine caveat handled here: DuckDB's regexp_replace is per-first-match
unless the 'g' flag is passed, while Spark's is always global — so the
scrub builder emits per-engine variants of the SAME pattern (the
pattern itself is restricted to the Java∩RE2 common subset: character
classes, bounded repetition, \\d/\\b — no backrefs, no lookaround).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Java-regex ∩ RE2 common subset — semantics identical in Spark + DuckDB
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"


# ---------------------------------------------------------------------------
# URL parsing / normalization — shared SQL (split_part is 1-based with
# identical semantics in Spark >= 3.4 and DuckDB)
# ---------------------------------------------------------------------------

def url_host_sql(url: str) -> str:
    """Lowercased authority of an absolute URL ('scheme://host/...')."""
    return f"lower(split_part({url}, '/', 3))"


def strip_www_sql(host: str) -> str:
    """Registered-host normalization: drop a leading 'www.'."""
    return (f"(CASE WHEN {host} LIKE 'www.%'"
            f" THEN substr({host}, 5) ELSE {host} END)")


def url_norm_host_sql(url: str) -> str:
    return strip_www_sql(url_host_sql(url))


def url_tld_sql(url: str) -> str:
    """Last dot-label of the host — the public-suffix heuristic
    (a real cluster would swap in the PSL; the parse plumbing is
    identical)."""
    host = url_norm_host_sql(url)
    return f"split_part({host}, '.', cast(length({host}) - length(replace({host}, '.', '')) + 1 as int))"


def url_path_seg_sql(url: str, k: int) -> str:
    """k-th path segment (1-based) of an absolute URL."""
    return f"split_part({url}, '/', {3 + k})"


def url_norm_host(url_col: str = "url") -> Column:
    """Column form of url_norm_host_sql (same expression tree)."""
    return F.expr(url_norm_host_sql(url_col))


# ---------------------------------------------------------------------------
# PII scrubbing — per-engine regexp_replace variants of one pattern
# ---------------------------------------------------------------------------

def pii_scrub_exprs(text: str, engine: str) -> dict[str, str]:
    """SQL expression strings for engine in {'spark', 'duckdb'}:

    - ``scrubbed``: text with emails -> <EMAIL>, IPv4s -> <IP>
      (emails first, so an IP-lookalike inside an email's domain is
      already gone — both engines apply the same order);
    - ``n_emails`` / ``n_ips``: match counts (regexp_extract_all).
    """
    if engine == "spark":
        def rrep(s, pat, to):
            return f"regexp_replace({s}, '{pat}', '{to}')"
        def rcnt(s, pat):
            return f"size(regexp_extract_all({s}, '{pat}', 0))"
        # Spark SQL string literals treat backslash as an escape
        email, ipv4 = EMAIL_RE.replace("\\", "\\\\"), IPV4_RE.replace("\\", "\\\\")
    elif engine == "duckdb":
        def rrep(s, pat, to):
            return f"regexp_replace({s}, '{pat}', '{to}', 'g')"
        def rcnt(s, pat):
            return f"cast(length(regexp_extract_all({s}, '{pat}')) as int)"
        email, ipv4 = EMAIL_RE, IPV4_RE
    else:  # pragma: no cover
        raise ValueError(f"engine must be spark/duckdb, got {engine!r}")
    return {
        "scrubbed": rrep(rrep(text, email, "<EMAIL>"), ipv4, "<IP>"),
        "n_emails": rcnt(text, email),
        "n_ips": rcnt(text, ipv4),
    }
