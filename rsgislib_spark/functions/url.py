"""URL normalization + PII scrubbing for the web-scale pipeline.

The input_hint's table is keyed by ``url`` — any Common-Crawl-style
pipeline needs host extraction / normalization before per-host
policies (crawl budgets, dedup scopes, robots buckets), and PII
redaction (emails, IPv4/full-form-IPv6 addresses, +CC phone numbers)
before text ships to training. RSGISLib has no text ops; these are
pipeline-first-class additions alongside functions/text.py.

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
# full 8-group form only (compressed '::' and IPv4-mapped forms are
# out of this heuristic's scope — documented, like the PSL caveat)
IPV6_RE = r"\b[0-9a-fA-F]{1,4}(:[0-9a-fA-F]{1,4}){7}\b"
# international-ish with separators: +CC-AAA-BBB-NNNN ('-' or ' ');
# the leading '+' disambiguates from IPv4/dates, the trailing \b
# stops a 5-digit final group from half-matching
PHONE_RE = r"\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}\b"

# scrub order matters: emails first (an IP-lookalike inside an email
# domain is gone before the IP pass), IPv6 before IPv4 (no overlap in
# the full form, but the order is pinned so both engines agree), phone
# last. Each entity's COUNT is taken on the text state just before
# its own replacement pass, so counts == replacements by construction
# (the r4 ADVICE finding: raw-text counts could exceed replacements).
PII_ENTITIES = [
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_ipv6", IPV6_RE, "<IPV6>"),
    ("n_ips", IPV4_RE, "<IP>"),
    ("n_phones", PHONE_RE, "<PHONE>"),
]


# ---------------------------------------------------------------------------
# URL parsing / normalization — shared SQL (split_part is 1-based with
# identical semantics in Spark >= 3.4 and DuckDB)
# ---------------------------------------------------------------------------

def url_host_sql(url: str) -> str:
    """Lowercased host of an absolute URL ('scheme://host/...'),
    with 'userinfo@' and ':port' stripped from the authority
    ('user:pass@host:8080' -> 'host'). Userinfo is taken to end at
    the first '@' (valid URLs percent-encode '@' inside userinfo);
    bracketed IPv6 literal hosts are out of scope, like the PSL."""
    auth = f"lower(split_part({url}, '/', 3))"
    no_user = (f"(CASE WHEN {auth} LIKE '%@%'"
               f" THEN split_part({auth}, '@', 2) ELSE {auth} END)")
    return f"split_part({no_user}, ':', 1)"


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

def _pii_engine_fns(engine: str):
    """(rrep, rcnt, escape) for engine in {'spark', 'duckdb'} — same
    pattern, per-engine global-replace flag and list-length idiom."""
    if engine == "spark":
        def rrep(s, pat, to):
            return f"regexp_replace({s}, '{pat}', '{to}')"
        def rcnt(s, pat):
            return f"size(regexp_extract_all({s}, '{pat}', 0))"
        # Spark SQL string literals treat backslash as an escape
        def esc(pat):
            return pat.replace("\\", "\\\\")
    elif engine == "duckdb":
        def rrep(s, pat, to):
            return f"regexp_replace({s}, '{pat}', '{to}', 'g')"
        def rcnt(s, pat):
            return f"cast(length(regexp_extract_all({s}, '{pat}')) as int)"
        def esc(pat):
            return pat
    else:  # pragma: no cover
        raise ValueError(f"engine must be spark/duckdb, got {engine!r}")
    return rrep, rcnt, esc


def pii_scrub_exprs(text: str, engine: str) -> dict[str, str]:
    """SQL expression strings for engine in {'spark', 'duckdb'}:

    - ``scrubbed``: text with emails -> <EMAIL>, full-form IPv6 ->
      <IPV6>, IPv4 -> <IP>, +CC phone numbers -> <PHONE>, applied in
      that pinned order on both engines;
    - ``n_emails`` / ``n_ipv6`` / ``n_ips`` / ``n_phones``:
      REPLACEMENT counts — each entity is counted on the text state
      just before its own replacement pass, so an IP-lookalike inside
      an email's domain is neither replaced nor counted.

    Inline-expression form: each staged count textually nests the
    earlier scrub passes (the engines may or may not CSE them). For
    the scan-speed plan use pii_scrub_select_sql, which projects each
    stage once per row.
    """
    rrep, rcnt, esc = _pii_engine_fns(engine)
    out, cur = {}, text
    for key, pat, tag in PII_ENTITIES:
        out[key] = rcnt(cur, esc(pat))
        cur = rrep(cur, esc(pat), tag)
    out["scrubbed"] = cur
    return out


def pii_scrub_select_sql(source: str, text_expr: str, id_cols: list[str],
                         engine: str) -> str:
    """Full scan-speed scrub query: nested subqueries project each
    scrub stage ONCE (8 regex passes per row total — 4 counts + 4
    replaces — instead of re-evaluating prefix chains per count).
    ``source`` is a table name or parenthesized subquery; returns a
    SELECT yielding id_cols + n_emails/n_ipv6/n_ips/n_phones +
    ``scrubbed``. Same expression text on both engines modulo the
    global-replace idiom, so the DuckDB oracle checks the identical
    staged shape."""
    rrep, rcnt, esc = _pii_engine_fns(engine)
    ids = ", ".join(id_cols)
    sql = f"SELECT {ids}, {text_expr} AS _s0 FROM {source}"
    keys = []
    for i, (key, pat, tag) in enumerate(PII_ENTITIES):
        prev, nxt = f"_s{i}", f"_s{i + 1}"
        cols = ", ".join([ids] + keys)
        sql = (f"SELECT {cols}, {rcnt(prev, esc(pat))} AS {key}, "
               f"{rrep(prev, esc(pat), tag)} AS {nxt} FROM ({sql})")
        keys.append(key)
    last = f"_s{len(PII_ENTITIES)}"
    return (f"SELECT {ids}, {', '.join(keys)}, {last} AS scrubbed "
            f"FROM ({sql})")
