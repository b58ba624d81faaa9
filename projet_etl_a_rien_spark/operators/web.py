"""Web/URL operators — the step-0 surface of a crawl-derived training
corpus: URL canonicalization, registered-domain extraction, URL-level
exact dedup, and domain/path blocklist filtering.

A 100 TB web corpus starts life as (url, payload) pairs, and the first
three things every pipeline does happen BEFORE any text quality gate:

1. canonicalize the URL (case-fold scheme/host, strip ``www.`` and
   default ports, drop fragments, drop tracking params, order-normalize
   the query string) so that syntactic variants of one resource collide;
2. exact-dedup on the canonical URL (recrawls and parameter-jittered
   refetches are the single biggest duplicate source in CommonCrawl-
   style data — cheaper to kill here than in MinHash);
3. drop blocklisted domains / path prefixes.

Scale shape: canonicalization is a pure per-row projection built from
``regexp_extract`` / higher-order array functions — no shuffle, fully
inside whole-stage codegen, and it vectorizes identically at any corpus
size. URL dedup groups by a canonical-URL digest (one exchange keyed by
``md5(url_canon)``, never the raw string — constant-width shuffle rows).
Blocklist filtering is a broadcast-friendly literal table join expressed
as a pure predicate here (the list is O(100k) domains in production — it
would arrive as a small DataFrame and AQE would broadcast it; the
operator keeps the registered-domain extraction separate from the
predicate so that swap is one join).

The sandbox corpus has no URL column, so URLs are SYNTHESIZED
deterministically from (doc_id, source, lang) with the literal constants
below — the same shared-literal discipline as the HTML/mojibake fixtures
(``operators/text.py``): the DuckDB oracles interpolate the very same
constants, so the two engines parse identical strings.

Every regex used is RE2-safe (no lookaround/backrefs) and parses
identically in java.util.regex and DuckDB's RE2.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .idn import canonical_idn_host, nfc_compose

# --------------------------------------------------------------------------
# Shared literals (interpolated verbatim into the DuckDB oracles)
# --------------------------------------------------------------------------

# Dirty-URL synthesis: one underlying resource per floor(doc_id / 3), so
# canonical-URL dedup groups have size <= 3 at ANY scale factor (group
# size is a property of the synthesis, not of the corpus size).
URL_GROUP_DIV = 3

# Language section of the synthesized path — a function of the RESOURCE
# id (collision-relevant parts must not vary inside a dedup group).
URL_LANGS = ("en", "de", "es", "fr", "zh")

# Tracking query parameters a canonicalizer strips (prefix match on the
# key, the industry-standard list head).
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")

# Split a URL into (scheme)://(authority)(path)[?query][#fragment].
# Group numbers: 1=scheme, 2=host[:port], 3=path, 4=query-with-?, 5=frag.
URL_PARTS_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"

# Registered domain = last two dot-labels of the host (public-suffix
# lists collapse to this for the synthesized *.{src}.com space).
REG_DOMAIN_RE = r"([^.]+\.[^.]+)$"

# Blocklist fixture: registered domains dropped wholesale, plus one
# path-prefix rule (language-section takedown).
BLOCKED_DOMAINS = ("src1.com", "src3.com", "src13.com")
BLOCKED_PATH_PREFIX = "/es/"


def synth_url(doc_id: Column | str = "doc_id") -> Column:
    """Deterministic dirty URL for a document row.

    The underlying resource identity is ``rid = floor(doc_id /
    URL_GROUP_DIV)`` and EVERY collision-relevant URL part (host core,
    path, surviving query params) is a function of ``rid`` alone, so
    the ``URL_GROUP_DIV`` consecutive doc_ids alias to one canonical
    URL — bounded dedup groups at any scale. Noise axes are driven by
    ``doc_id % k`` so every canonicalizer rule is exercised in any
    100-doc window:

    - ``doc_id % 7 == 0``  → scheme spelled ``HTTPS`` (case noise);
    - ``doc_id % 3 == 0``  → host carries a ``WWW.`` prefix;
    - ``doc_id % 5 == 0``  → explicit default port ``:443``;
    - ``doc_id % 2 == 0``  → tracking params appended, param order
      swapped, trailing slash, and a fragment present;
    - ``doc_id % 11 == 0`` → the ``doc`` path segment spelled
      ``d%6Fc`` (uppercase-hex escape of unreserved ``o``);
    - ``doc_id % 11 == 1`` → the same spelled ``d%6fc`` (lowercase
      hex), so both escape cases decode to one canonical path;
    - every query carries ``u=~a`` spelled ``u=%7ea`` on the dirty
      branch (unreserved-tilde decode) and a RETAINED reserved escape
      ``q=a%2Fb`` spelled with lowercase hex ``a%2fb`` on the dirty
      branch (hex-case normalization);
    - ``rid % 13 == 7``  → the host's first label is the IDN name
      ``münchen``, spelled by ``doc_id % 3`` as the uppercase ACE form
      ``XN--MNCHEN-3YA``, precomposed Unicode, or decomposed
      ``mu`` + U+0308 — all three must collide on one canonical host
      (punycode decode + NFC composition);
    - ``rid % 17 == 5``  → the path gains a ``café`` segment spelled
      precomposed (odd doc_id) or decomposed ``cafe`` + U+0301 (even),
      exercising the path's NFC composition.
    """
    d = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    rid = F.floor(d / URL_GROUP_DIV)
    scheme = F.when(d % 7 == 0, F.lit("HTTPS")).otherwise(F.lit("https"))
    lang_seg = F.lit(None).cast("string")
    for i, lg in enumerate(URL_LANGS):
        lang_seg = F.when(rid % len(URL_LANGS) == i, F.lit(lg)).otherwise(
            lang_seg
        )
    # the two Unicode spellings differ at byte level: the .when branch
    # is precomposed U+00FC, the .otherwise is decomposed u + U+0308
    idn_label = (
        F.when(d % 3 == 0, F.lit("XN--MNCHEN-3YA"))
        .when(d % 3 == 1, F.lit("münchen"))
        .otherwise(F.lit("münchen"))
    )
    first_label = F.when(rid % 13 == 7, idn_label).otherwise(
        F.concat(F.lit("Host"), (rid % 4).cast("string"))
    )
    host = F.concat(
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        first_label,
        F.lit(".src"), (rid % 20).cast("string"), F.lit(".com"),
        F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
    )
    doc_seg = (
        F.when(d % 11 == 0, F.lit("d%6Fc"))
        .when(d % 11 == 1, F.lit("d%6fc"))
        .otherwise(F.lit("doc"))
    )
    # NFC (odd doc_id, precomposed U+00E9) vs NFD (even, e + U+0301)
    cafe_seg = F.when(
        rid % 17 == 5,
        F.when(d % 2 == 1, F.lit("/café")).otherwise(
            F.lit("/café")
        ),
    ).otherwise(F.lit(""))
    path = F.concat(F.lit("/"), lang_seg, F.lit("/"), doc_seg, cafe_seg,
                    F.lit("/"), rid.cast("string"),
                    F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")))
    q_keep = F.concat(F.lit("id="), rid.cast("string"), F.lit("&page="),
                      (rid % 4).cast("string"),
                      F.lit("&q=a%2Fb&u=~a"))
    q_dirty = F.concat(F.lit("page="), (rid % 4).cast("string"),
                       F.lit("&q=a%2fb&u=%7ea"),
                       F.lit("&utm_source=feed&id="), rid.cast("string"),
                       F.lit("&fbclid=zz"), (d % 9).cast("string"))
    query = F.when(d % 2 == 0, q_dirty).otherwise(q_keep)
    frag = F.when(d % 2 == 0, F.lit("#sec1")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, F.lit("?"), query, frag)


def _part(url: Column, group: int) -> Column:
    return F.regexp_extract(url, URL_PARTS_RE, group)


def _hex_nibble(c: Column) -> Column:
    """Value of one hex digit (case-insensitive), -1 if not hex — pure
    ascii() arithmetic so the DuckDB rendering is character-identical."""
    a = F.ascii(F.lower(c))
    return (
        F.when((a >= 48) & (a <= 57), a - 48)
        .when((a >= 97) & (a <= 102), a - 87)
        .otherwise(F.lit(-1))
    )


def normalize_pct_escapes(s: Column) -> Column:
    """RFC 3986 §2.3/§6.2.2 percent-escape normalization: escapes of
    UNRESERVED characters (ALPHA / DIGIT / ``-._~``) decode to the
    literal character (``%7Euser`` and ``%7euser`` both become
    ``~user``), every RETAINED escape gets uppercase hex digits
    (``%2f`` -> ``%2F``), and malformed escapes (``%``, ``%Z9``) stay
    byte-for-byte literal. Without this a web-scale URL dedup
    under-merges immediately — crawlers emit both encodings of the same
    resource.

    Shape: split on ``%`` + one higher-order ``transform`` over the
    tail segments — per-row array work, no shuffle, no Python; the
    nibble arithmetic is plain ascii() math so the DuckDB oracle
    renders the identical expression.
    """
    segs = F.split(s, "%", -1)
    head = F.element_at(segs, 1)

    def _fix(seg: Column) -> Column:
        n1 = _hex_nibble(F.substring(seg, 1, 1))
        n2 = _hex_nibble(F.substring(seg, 2, 1))
        code = n1 * 16 + n2
        valid = (F.length(seg) >= 2) & (n1 >= 0) & (n2 >= 0)
        unreserved = (
            ((code >= 48) & (code <= 57))
            | ((code >= 65) & (code <= 90))
            | ((code >= 97) & (code <= 122))
            | code.isin(45, 46, 95, 126)
        )
        rest = F.substr(seg, F.lit(3))
        return (
            F.when(valid & unreserved, F.concat(F.char(code), rest))
            .when(
                valid,
                F.concat(
                    F.lit("%"), F.upper(F.substring(seg, 1, 2)), rest
                ),
            )
            .otherwise(F.concat(F.lit("%"), seg))
        )

    tail = F.slice(segs, 2, F.greatest(F.size(segs) - 1, F.lit(0)))
    return F.concat(head, F.array_join(F.transform(tail, _fix), ""))


def canonical_host(url: Column) -> Column:
    """lower(host) — Unicode-aware, so internationalized (IDN) hosts
    case-fold too — strip one leading ``www.``, strip only the
    scheme's OWN default port (``:443`` under https, ``:80`` under
    http; ``http://host:443`` names a non-default port — a different
    resource — and keeps it), then fold every label to its canonical
    Unicode form: ``xn--`` ACE labels punycode-decode (RFC 3492, a pure
    F.aggregate fold — operators/idn.py) and all labels compose to NFC
    — so ``münchen.example``, ``MÜNCHEN.example`` (decomposed),
    and ``xn--mnchen-3ya.example`` collide on one canonical host."""
    scheme = F.lower(_part(url, 1))
    h = F.lower(_part(url, 2))
    h = F.regexp_replace(h, r"^www\.", "")
    h = (
        F.when(scheme == "https", F.regexp_replace(h, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(h, r":80$", ""))
        .otherwise(h)
    )
    return canonical_idn_host(h)


def canonical_path(url: Column) -> Column:
    """Normalize percent-escapes, strip one trailing slash (non-root),
    empty path becomes ``/`` — then compose the result to NFC
    (operators/idn.py), so the precomposed and decomposed spellings of
    a non-ASCII path segment (``café`` vs ``cafe`` + U+0301) collide.
    Composition assumes canonically-ordered input (true of NFC/NFD
    text, the web's two spellings)."""
    p = normalize_pct_escapes(_part(url, 3))
    p = F.regexp_replace(p, r"(.)/$", r"$1")
    return nfc_compose(F.when(p == "", F.lit("/")).otherwise(p))


def canonical_query_params(url: Column) -> Column:
    """Surviving query params: each param percent-normalized FIRST (so
    an encoded ``%75tm_source`` is recognized as tracking and two
    encodings of one value collide), tracking keys dropped, survivors
    sorted bytewise."""
    q = F.regexp_replace(_part(url, 4), r"^\?", "")
    kvs = F.transform(F.split(q, "&"), normalize_pct_escapes)
    kvs = F.filter(
        kvs,
        lambda kv: (kv != "")
        & ~reduce(
            lambda a, b: a | b,
            [kv.startswith(p) for p in TRACKING_PREFIXES],
        ),
    )
    return F.array_sort(kvs)


def canonical_query(url: Column) -> Column:
    """Drop tracking params, sort survivors bytewise, rejoin with ``&``.

    Array built per-row with split/filter/array_sort — no shuffle, no
    Python. Empty result collapses to the empty string (no dangling
    ``?`` in the canonical form).
    """
    return F.array_join(canonical_query_params(url), "&")


def canonical_url(url: Column) -> Column:
    scheme = F.lower(_part(url, 1))
    qs = canonical_query(url)
    return F.concat(
        scheme, F.lit("://"), canonical_host(url), canonical_path(url),
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


# --------------------------------------------------------------------------
# Construction cache. The IDN/NFC canonicalizer is a multi-thousand-node
# expression whose PYTHON-side construction (one py4j round-trip per
# node) measured ~8 s per query invocation — pure driver overhead,
# invisible at 100 TB but dominant in a benchmark that re-invokes the
# query function per sweep. Column objects are immutable, reusable
# expression trees, so each canonical part is built ONCE per (process,
# column name) and shared by every consumer; the JVM-side tree copy per
# reference is cheap.
# --------------------------------------------------------------------------

_CANON_CACHE: dict[str, dict[str, Column]] = {}


def canon_parts(url_col: str = "url") -> dict[str, Column]:
    """Cached canonicalizer columns over ``F.col(url_col)``: scheme,
    host, path, params (sorted survivors), norm_params_all (every
    nonempty param percent-normalized, pre-tracking-filter) and the
    full url_canon."""
    parts = _CANON_CACHE.get(url_col)
    if parts is None:
        u = F.col(url_col)
        host = canonical_host(u)
        path = canonical_path(u)
        params = canonical_query_params(u)
        qs = F.array_join(params, "&")
        raw_q = F.regexp_replace(_part(u, 4), r"^\?", "")
        norm_all = F.filter(
            F.transform(F.split(raw_q, "&"), normalize_pct_escapes),
            lambda kv: kv != "",
        )
        scheme = F.lower(_part(u, 1))
        parts = {
            "scheme": scheme,
            "host": host,
            "path": path,
            "params": params,
            "norm_params_all": norm_all,
            "url_canon": F.concat(
                scheme, F.lit("://"), host, path,
                F.when(qs == "", F.lit("")).otherwise(
                    F.concat(F.lit("?"), qs)
                ),
            ),
        }
        _CANON_CACHE[url_col] = parts
    return parts


def registered_domain(host: Column) -> Column:
    return F.regexp_extract(host, REG_DOMAIN_RE, 1)


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-row canonicalization + URL anatomy (host, registered domain,
    path depth, query-param count, tracking flag). Pure projection;
    every heavy expression comes from the construction cache.

    r14 shape: the heavy canonical parts (IDN/NFC host, escape-
    normalized path, filtered param array) are computed in ONE
    projection, each exactly once per row, behind a lineage barrier;
    the output assembles url_canon/registered_domain/path_depth from
    those COLUMNS. The previous single projection referenced host 3x,
    path 2x and the params 2x — and CollapseProject additionally
    inlined the caller's url expression into every reference — so each
    row paid the multi-thousand-node canonicalizer several times over
    (guide §2.3 "don't compute what you throw away"; the SCALE_NOTES
    §10 alias-inlining trap at operator scope). url_canon is
    reassembled with the identical concat the cached builder uses, so
    results are byte-identical."""
    p = canon_parts(url_col)
    # tracking detection on the NORMALIZED params, so an encoded
    # %75tm_source counts as tracking just as the canonicalizer drops it
    tracked = F.exists(
        p["norm_params_all"],
        lambda kv: reduce(
            lambda a, b: a | b,
            [kv.startswith(pre) for pre in TRACKING_PREFIXES],
        ),
    )
    parts = df.select(
        "doc_id",
        F.col(url_col).alias("url_raw"),
        p["scheme"].alias("_scheme"),
        p["host"].alias("host"),
        p["path"].alias("_path"),
        p["params"].alias("_params"),
        tracked.alias("had_tracking"),
    ).localCheckpoint(eager=True)
    qs = F.array_join(F.col("_params"), "&")
    return parts.select(
        "doc_id",
        "url_raw",
        F.concat(
            F.col("_scheme"), F.lit("://"), F.col("host"), F.col("_path"),
            F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
        ).alias("url_canon"),
        "host",
        registered_domain(F.col("host")).alias("registered_domain"),
        F.size(F.filter(F.split(F.col("_path"), "/"), lambda s: s != ""))
        .cast("long")
        .alias("path_depth"),
        F.size(F.col("_params")).cast("long").alias("n_query_params"),
        "had_tracking",
    )


def url_dedup_keepers(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Exact dedup on the canonical URL: keeper = smallest doc_id.

    The exchange is keyed by ``md5(url_canon)`` (constant 32-char rows at
    any URL length); the canonical string rides along only for the output
    projection. One shuffle, map-side partial min/count.
    """
    canon = df.select(
        "doc_id",
        canon_parts(url_col)["url_canon"].alias("url_canon"),
    ).withColumn("url_h", F.md5("url_canon"))
    return (
        canon.groupBy("url_h")
        .agg(
            F.min("url_canon").alias("url_canon"),
            F.min("doc_id").alias("keeper_id"),
            F.count("*").alias("n_docs"),
        )
        .select("url_canon", "keeper_id", "n_docs")
    )


def domain_blocklist_verdicts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-document blocklist verdict with reason precedence
    domain > path > allowed. Expressed as a literal predicate here; the
    production swap-in is a broadcast anti-join against a blocklist
    DataFrame keyed on registered_domain — the extraction below is the
    join key either way."""
    p = canon_parts(url_col)
    # one evaluation of the heavy host/path canonicalizers per row
    # behind a lineage barrier (r14 — the verdict CASE and the output
    # columns each referenced them again; same single-evaluation shape
    # as url_features)
    parts = df.select(
        "doc_id",
        registered_domain(p["host"]).alias("registered_domain"),
        p["path"].alias("path"),
    ).localCheckpoint(eager=True)
    dom_blocked = F.col("registered_domain").isin(*BLOCKED_DOMAINS)
    path_blocked = F.col("path").startswith(BLOCKED_PATH_PREFIX)
    return parts.select(
        "doc_id",
        "registered_domain",
        "path",
        F.when(dom_blocked, F.lit("domain"))
        .when(path_blocked, F.lit("path"))
        .otherwise(F.lit("allowed"))
        .alias("verdict"),
    )


def domain_stats(df: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Per-registered-domain corpus profile: doc count, distinct hosts,
    token total, and an exact parts-per-million share of all docs.

    Two aggregations (domain grain, then the 1-row total joined back as
    a broadcast scalar) — the standard exact-share idiom; ppm is integer
    so cross-engine hash parity is exact.
    """
    host = canon_parts(url_col)["host"]
    per_dom = (
        df.select(
            registered_domain(host).alias("registered_domain"),
            host.alias("host"),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tok"),
        )
        .groupBy("registered_domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    total = per_dom.agg(F.sum("n_docs").alias("total_docs"))
    return (
        per_dom.crossJoin(F.broadcast(total))
        .select(
            "registered_domain",
            "n_docs",
            "n_hosts",
            "n_tokens",
            F.round(F.col("n_docs") * 1_000_000.0 / F.col("total_docs"))
            .cast("long")
            .alias("docs_ppm"),
        )
    )
