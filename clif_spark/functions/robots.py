"""robots.txt parsing as a relation: derive per-host Allow/Disallow rules
from the crawl's own governance artifacts (RFC 9309 / the original 1994
REP) — the step BEFORE ``web_robots_filter``'s allow/deny application, so
the denylist is computed from fetched ``robots.txt`` bodies instead of
being handed in.

Pure Catalyst throughout: line split + posexplode, comment strip, a
lag-window group-boundary detector (a group is one or more consecutive
``User-agent:`` lines followed by rules — RFC 9309 §2.1), a running-sum
group id, and two filters joined on (host, group). No Python, no UDF;
the whole parse is window + projection work that fuses around one hash
exchange on host (robots bodies are one row per host — host-count sized,
KBs per row, trivially broadcastable downstream).

Precedence (RFC 9309 §2.2.2): for a given path, the rule with the
LONGEST matching prefix wins; when an Allow and a Disallow rule match
with EQUAL length, the Allow is used ("If an allow rule and a disallow
rule are equivalent, then the allow rule SHOULD be used"). This is what
makes the single most common real-world idiom work: ``Disallow: /`` +
``Allow: /public`` keeps the /public subtree crawlable. The match is
evaluated host-side as one ``array_max`` over (prefix_len, allow)
structs — Spark's struct ordering IS the RFC tiebreak.

Scope (documented, conservative — the C4/CC-Net compliance subset):
- group selection per RFC 9309 §2.2.1: groups naming the agent's
  product token exactly (case-insensitive — ``CCBot`` and ``ccbot``
  select the same group), FALLING BACK to the ``*`` groups when the
  host has no specific section; substring/version matching of product
  tokens (``FooBot/1.2`` vs a ``foobot`` group) is not performed —
  callers pass the bare product token;
- rule values support the §2.2.3 special characters: ``*`` matches any
  character run and a TRAILING ``$`` anchors the end (both translated
  to an anchored regex host-side, ``pattern_regex``; wildcard-free
  values keep the literal startswith fast path; specificity is the raw
  rule-value length for both kinds). %-encoding normalization remains
  out of scope (paths are compared as extracted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _grouped_lines(robots: DataFrame, host_col: str,
                   txt_col: str) -> DataFrame:
    """(host, pos, ln, is_ua, grp) — the shared parse front end: lines
    split + normalized, group boundaries detected, running-sum group
    ids."""
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
    return marked.withColumn("grp", F.sum("grp_start").over(w)) \
                 .drop("grp_start")


def _selected_groups(grouped: DataFrame, agent: str) -> DataFrame:
    """(host, grp) — RFC 9309 §2.2.1 group selection with the wildcard
    FALLBACK: groups naming the agent's product token exactly are the
    match; a host with NO such group falls back to its ``*`` groups (a
    crawler without its own section obeys the generic one — the
    pre-round-11 exact-token rule silently under-blocked it to zero
    rules). Matching is case-insensitive both sides. For agent='*' the
    two tiers coincide and this reduces to the wildcard selection.
    Host-count-sized throughout (one extra host-keyed max)."""
    agent_l = agent.lower()
    tok = F.trim(F.substring("ln", 12, 1 << 20))
    matched = (grouped
               .filter(F.col("is_ua") & tok.isin(agent_l, "*"))
               .select("host", "grp",
                       (tok == F.lit(agent_l)).alias("specific"))
               .distinct())
    has_specific = (matched.groupBy("host")
                    .agg(F.max("specific").alias("has_specific")))
    return (matched.join(has_specific, "host")
            .filter(F.col("specific") == F.col("has_specific"))
            .select("host", "grp").distinct())


def robots_rules(robots: DataFrame, host_col: str = "host",
                 txt_col: str = "robots_txt",
                 agent: str = "*") -> DataFrame:
    """(host, prefix, allow) — one row per Allow/Disallow rule in the
    groups ``_selected_groups`` picks for ``agent`` (exact product
    token, falling back to the ``*`` groups when the host has no
    specific section — RFC 9309 §2.2.1). Empty-value ``Disallow:`` /
    ``Allow:`` lines (no-op markers per RFC 9309) are dropped; duplicate
    (host, prefix, allow) rows dedup — a same-prefix Allow AND Disallow
    pair survives as two rows (the §2.2.2 tie the applier resolves
    toward Allow).

    Mirrored rule-for-rule by the DuckDB CTE in queries/web.py (the
    gated row) — keep the two in sync."""
    grouped = _grouped_lines(robots, host_col, txt_col)
    wild = _selected_groups(grouped, agent)
    is_dis = F.startswith(F.col("ln"), F.lit("disallow:"))
    is_alw = F.startswith(F.col("ln"), F.lit("allow:"))
    # 'disallow:' is 9 chars, 'allow:' is 6 — value starts at 10 / 7
    prefix = F.trim(F.when(is_alw, F.substring("ln", 7, 1 << 20))
                     .otherwise(F.substring("ln", 10, 1 << 20)))
    return (grouped
            .filter(is_dis | is_alw)
            .select("host", "grp", prefix.alias("prefix"),
                    is_alw.alias("allow"))
            .filter(F.col("prefix") != "")
            .join(wild, ["host", "grp"])
            .select("host", "prefix", "allow")
            .distinct())


def robots_crawl_delay(robots: DataFrame, host_col: str = "host",
                       txt_col: str = "robots_txt",
                       agent: str = "*") -> DataFrame:
    """(host, crawl_delay_s) — the ``Crawl-delay:`` directive of the
    agent's selected groups (same §2.2.1 selection + fallback as
    robots_rules), the de-facto politeness knob crawl schedulers turn
    into per-host fetch budgets. Values parse as decimals and take
    their CEILING in whole seconds (fractional delays like ``0.5`` are
    common in the wild; ceiling is the politest integer reading, and —
    deliberately — NOT a bare string->long cast, whose rounding
    direction differs between engines: Spark truncates '10.5' to 10
    where DuckDB rounds to 11). Non-numeric values parse to NULL and
    are dropped; multiple directives per host keep the MAX. Hosts
    without a directive are absent — callers decide their own default
    rate."""
    grouped = _grouped_lines(robots, host_col, txt_col)
    wild = _selected_groups(grouped, agent)
    # 'crawl-delay:' is 12 chars — value starts at 13
    val = F.ceil(F.trim(F.substring("ln", 13, 1 << 20))
                 .cast("decimal(18,6)")).cast("long")
    return (grouped
            .filter(F.startswith(F.col("ln"), F.lit("crawl-delay:")))
            .select("host", "grp", val.alias("crawl_delay_s"))
            .filter(F.col("crawl_delay_s").isNotNull())
            .join(wild, ["host", "grp"])
            .groupBy("host")
            .agg(F.max("crawl_delay_s").alias("crawl_delay_s")))


def robots_disallow_rules(robots: DataFrame, host_col: str = "host",
                          txt_col: str = "robots_txt",
                          agent: str = "*") -> DataFrame:
    """(host, disallow_prefix) — the Disallow rows of ``robots_rules``,
    kept for callers that want the deny-only view (no precedence)."""
    return (robots_rules(robots, host_col, txt_col, agent)
            .filter(~F.col("allow"))
            .select("host", F.col("prefix").alias("disallow_prefix")))


def pattern_regex(prefix: Column) -> Column:
    """Translate an RFC 9309 rule value into an anchored Java/RE2 regex
    (both engines agree on this subset): a TRAILING ``$`` anchors the
    end (§2.2.3), ``*`` matches any character run, every other regex
    metacharacter is escaped to a literal (``Disallow: /a/1.`` must not
    block ``/a/15``). Mid-pattern ``$`` is literal per spec. Returns
    NULL for wildcard-free values — the applier keeps those on the
    cheaper literal startswith path."""
    anchored = F.endswith(prefix, F.lit("$"))
    body = F.when(anchored,
                  F.substr(prefix, F.lit(1), F.length(prefix) - 1)) \
            .otherwise(prefix)
    esc = F.regexp_replace(body, r"([.\[\]{}()+?^$|\\])", "\\\\$1")
    star = F.regexp_replace(esc, r"\*", ".*")
    rx = F.concat(F.lit("^"), star,
                  F.when(anchored, F.lit("$")).otherwise(F.lit("")))
    return F.when(prefix.rlike(r"[*]") | anchored, rx)


def apply_robots_rules(urls: DataFrame, rules: DataFrame,
                       host_col: str = "host",
                       path_col: str = "path") -> DataFrame:
    """``urls`` plus a boolean ``robots_blocked``, evaluated with RFC
    9309 §2.2.2 longest-match precedence: among the host's rules whose
    prefix literal-prefix-matches the URL path, the longest prefix
    decides (Disallow → blocked, Allow → kept); an equal-length
    Allow/Disallow tie resolves to Allow; no matching rule → kept.

    Wildcard rules (``*`` / trailing ``$``, §2.2.3) match through their
    translated anchored regex (``pattern_regex``); wildcard-free rules
    keep the cheaper literal startswith. Specificity for BOTH kinds is
    the RAW rule-value length (the RFC's most-specific measure).

    Rules are collapsed to one array-of-struct row per host and
    BROADCAST (host-count sized), so the corpus side takes one narrow
    ``filter`` + ``array_max`` projection — the struct ordering
    (prefix_len, allow) IS the precedence rule, so the whole verdict is
    a single fused expression: no shuffle, no per-rule row
    multiplication."""
    per_host = (rules.groupBy("host")
                .agg(F.collect_list(
                    F.struct(F.col("prefix"), F.col("allow"),
                             pattern_regex(F.col("prefix")).alias("rx")))
                    .alias("__rules")))
    joined = urls.join(
        F.broadcast(per_host),
        urls[host_col] == per_host["host"], "left").drop(per_host["host"])
    path = F.col(path_col)

    def matches(r):
        return (F.when(r["rx"].isNull(), F.startswith(path, r["prefix"]))
                 .otherwise(F.regexp_like(path, r["rx"])))

    best = F.array_max(F.transform(
        F.filter("__rules", matches),
        lambda r: F.struct(F.length(r["prefix"]).alias("l"),
                           r["allow"].alias("a"))))
    blocked = F.coalesce(~best["a"], F.lit(False))
    return joined.withColumn("robots_blocked", blocked).drop("__rules")


def robots_sitemaps(robots: DataFrame, host_col: str = "host",
                    txt_col: str = "robots_txt") -> DataFrame:
    """(host, sitemap_loc, cross_host) — the ``Sitemap:`` discovery
    directive (sitemaps.org; the robots.txt line that tells a crawler
    where the host's sitemaps live, closing the robots -> sitemap ->
    seeds chain). Group-INDEPENDENT per the protocol: valid anywhere
    in the file, applying to every agent, so this parser deliberately
    does NOT go through ``_grouped_lines`` — and must not, because
    that front end lowercases whole lines for directive matching,
    which would corrupt the case-SENSITIVE URL value. Here only the
    directive match is case-insensitive (``SITEMAP:`` works); the URL
    survives byte-for-byte. Cross-host declarations are legal (a CDN
    hosting a shared sitemap) and flagged rather than dropped —
    whether to trust them is crawl policy, not parsing.

    Same shape as the rules parse: host-count sized, one line explode
    + narrow projection, no Python. DuckDB mirror beside the gated row
    (queries/web.py web_robots_sitemap_discovery) — keep in sync."""
    host = F.col(host_col)
    lines = robots.select(
        host.alias("host"),
        F.explode(F.split(F.col(txt_col), "\n")).alias("line"))
    raw = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("line"), r"\r", ""), r"#.*$", ""))
    loc = F.trim(F.substring(raw, 9, 1 << 20))
    auth = F.lower(F.regexp_extract(
        loc, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    return (lines
            .select("host", loc.alias("sitemap_loc"),
                    F.startswith(F.lower(raw), F.lit("sitemap:"))
                     .alias("__is"),
                    (auth != F.col("host")).alias("cross_host"))
            .filter(F.col("__is") & (F.col("sitemap_loc") != ""))
            .drop("__is"))
