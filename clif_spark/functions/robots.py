"""robots.txt parsing as a relation: derive per-host Disallow rules from
the crawl's own governance artifacts (RFC 9309 / the original 1994 REP) —
the step BEFORE ``web_robots_filter``'s allow/deny application, so the
denylist is computed from fetched ``robots.txt`` bodies instead of being
handed in.

Pure Catalyst throughout: line split + posexplode, comment strip, a
lag-window group-boundary detector (a group is one or more consecutive
``User-agent:`` lines followed by rules — RFC 9309 §2.1), a running-sum
group id, and two filters joined on (host, group). No Python, no UDF;
the whole parse is window + projection work that fuses around one hash
exchange on host (robots bodies are one row per host — host-count sized,
KBs per row, trivially broadcastable downstream).

Scope (documented, conservative — the C4/CC-Net compliance subset):
- ``Disallow:`` prefixes only; ``Allow:`` overrides and the
  longest-match precedence rule are NOT evaluated (treating an
  Allow-carved subtree as still disallowed never fetches more than the
  site permits — fail-closed);
- group selection by EXACT agent token match (default ``*``), no
  most-specific-agent fallback chain;
- prefixes are literal string prefixes: ``$``/``*`` wildcards and
  %-encoding normalization are not interpreted (rare in disallow lines;
  a literal match on a wildcard pattern simply never fires — again
  fail-closed is the wrong word here: it under-blocks, so callers with
  strict compliance needs pre-expand wildcards upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def robots_disallow_rules(robots: DataFrame, host_col: str = "host",
                          txt_col: str = "robots_txt",
                          agent: str = "*") -> DataFrame:
    """(host, disallow_prefix) — one row per Disallow rule in any group
    whose ``User-agent:`` tokens include ``agent`` (exact match after
    lowercasing/trim). Empty ``Disallow:`` lines (allow-all markers) are
    dropped; duplicate rules dedup.

    Mirrored rule-for-rule by the DuckDB CTE in queries/web.py (the
    gated row) — keep the two in sync."""
    host = F.col(host_col)
    w = Window.partitionBy("host").orderBy("pos")
    lines = robots.select(
        host.alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "line"))
    # \r dropped BEFORE trim: real robots.txt bodies are commonly CRLF
    # and Spark's trim strips spaces only — a trailing \r would make
    # 'user-agent: *' token-match fail silently
    ln = F.lower(F.trim(F.regexp_replace(
        F.regexp_replace(F.col("line"), r"\r", ""), r"#.*$", "")))
    clean = lines.select("host", "pos", ln.alias("ln"))
    is_ua = F.startswith(F.col("ln"), F.lit("user-agent:"))
    prev_is_ua = F.coalesce(
        F.startswith(F.lag("ln").over(w), F.lit("user-agent:")),
        F.lit(False))
    marked = clean.select(
        "host", "pos", "ln", is_ua.alias("is_ua"),
        (is_ua & ~prev_is_ua).cast("int").alias("grp_start"))
    grouped = marked.withColumn("grp", F.sum("grp_start").over(w))
    wild = (grouped
            .filter(F.col("is_ua")
                    & (F.trim(F.substring("ln", 12, 1 << 20))
                       == F.lit(agent)))
            .select("host", "grp").distinct())
    prefix = F.trim(F.substring("ln", 10, 1 << 20))
    return (grouped
            .filter(F.startswith(F.col("ln"), F.lit("disallow:")))
            .select("host", "grp", prefix.alias("disallow_prefix"))
            .filter(F.col("disallow_prefix") != "")
            .join(wild, ["host", "grp"])
            .select("host", "disallow_prefix")
            .distinct())


def apply_robots_rules(urls: DataFrame, rules: DataFrame,
                       host_col: str = "host",
                       path_col: str = "path") -> DataFrame:
    """``urls`` plus a boolean ``robots_blocked``: TRUE when any of the
    host's disallow prefixes literal-prefix-matches the URL path. Rules
    are collapsed to one array row per host and BROADCAST (host-count
    sized), so the corpus side takes one narrow ``exists()`` projection
    — no shuffle, no per-rule row multiplication."""
    per_host = (rules.groupBy("host")
                .agg(F.collect_list("disallow_prefix").alias("__prefixes")))
    joined = urls.join(
        F.broadcast(per_host),
        urls[host_col] == per_host["host"], "left").drop(per_host["host"])
    blocked = F.coalesce(
        F.exists("__prefixes",
                 lambda p: F.startswith(F.col(path_col), p)),
        F.lit(False))
    return joined.withColumn("robots_blocked", blocked).drop("__prefixes")
