"""IDN + Unicode normalization for URL canonicalization — pure Catalyst
expressions, zero Python in the hot path.

Two gaps make a multilingual web dedup under-merge even after
percent-escape normalization (the r8 verdict's #2 ask):

1. ``münchen.example`` and its punycode twin ``xn--mnchen-3ya.example``
   name one host (RFC 3490/5890: the ACE form IS the wire encoding of
   the Unicode form);
2. ``café`` spelled precomposed (NFC, U+00E9) and decomposed (NFD,
   ``e`` + U+0301) in a host label or path segment are one string under
   Unicode canonical equivalence.

Both are solved here WITHOUT a UDF:

- **Punycode decode (RFC 3492 §6.2)** is a left-to-right stateful scan
  — exactly the shape of one ``F.aggregate`` fold over the label's
  character array. The accumulator carries the decoder state (output
  codepoints, n, i, bias, and the in-flight variable-length integer's
  w/k/oldi); ``adapt()``'s inner while-loop is a bounded unroll (delta
  shrinks 35× per step — 6 steps cover any 32-bit delta). All decoder
  arithmetic stays < 2^53, so double division + floor is exact.
- **Canonical composition** (the NFC composition step) is a second fold
  over codepoints with a literal composition map derived from Python's
  ``unicodedata`` at import time — the COMPLETE Unicode primary-pair
  set (941 entries: every BMP script with pair composites plus the 13
  astral composing pairs; no carve-outs) — plus the two closed-form
  Hangul branches (L+V and LV+T are pure arithmetic — Unicode §3.12).
  The fold implements UAX #15's canonical-composition blocking with a
  combining-class table (also a unicodedata-derived literal): a starter
  composes with a LATER mark across lower-ccc non-composing marks
  (e + U+0339 + U+0301 → é + U+0339, matching real NFC), and a mark is
  blocked only by an intervening ccc ≥ its own. Astral codepoints pass
  through the whole pipeline (split('')/ascii() are code-point aware,
  probed), so emoji ACE labels decode correctly. Contract: this is the
  composition STEP over canonically-ORDERED input (true of all NFC/NFD
  text — the web's two spellings); arbitrary mark reorderings are not
  performed, and precomposed composition-EXCLUSION characters (which
  full NFC would decompose) pass through — both pinned by test.
- **Totality over untrusted input**: a syntactically well-formed but
  semantically malformed ACE label (e.g. ``xn--zzzzzzzzzzzzzzzzzz``)
  would overflow the decoder's integer state and emit invalid
  codepoints; the fold carries an ``ok`` flag that trips on i/w
  overflow or out-of-range/surrogate codepoints, the label then passes
  through LITERALLY (standard IDNA behavior for undecodable ACE
  labels), and ``_cp_utf8_hex`` additionally maps any out-of-range
  codepoint to U+FFFD so ``cps_to_string`` is total — one adversarial
  crawl URL can no longer abort the canonicalization job.

Scale shape: per-row array folds, no shuffle, no Python, inside
whole-stage codegen — the same cost class as the percent-escape
normalizer they compose with. The DuckDB oracle side uses the built-in
``nfc_normalize`` plus a corpus-bounded ACE→Unicode replace (the
synthesized corpus carries exactly one ACE literal); general decode
correctness is pinned by a property test against Python's own
``idna``/punycode codec on randomized labels (tests/test_round9.py).
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Canonical composition map (base_cp, mark_cp) -> composed_cp, as two
# literal arrays feeding one map literal. Derived from unicodedata's
# one-level canonical decompositions; round-tripping through NFD/NFC
# filters the composition-exclusion set for us.
# --------------------------------------------------------------------------

_KEY_SHIFT = 1 << 21  # codepoints < 2^21, so key = base*2^21 + mark


def _compose_pairs() -> tuple[list[int], list[int]]:
    """Every two-codepoint primary composite in Unicode — 928 BMP pairs
    plus the 13 astral ones (Brahmi/Chakma/Grantha/Tirhuta/Siddham/
    Dives Akuru vowel composites; the musical-symbol "composites" are
    composition EXCLUSIONS, so full NFC leaves them decomposed too and
    the exclusion filter below drops them). Nothing is carved out: the
    map is the complete NFC pair set (941 entries)."""
    import sys

    keys, vals = [], []
    for comp in range(0xC0, sys.maxunicode + 1):
        c = chr(comp)
        d = unicodedata.decomposition(c)
        if not d or d.startswith("<"):
            continue
        parts = d.split()
        if len(parts) != 2:
            continue
        base, mark = (int(p, 16) for p in parts)
        # exclusion check: a pair only composes if NFC actually maps the
        # decomposed form back (composition exclusions don't)
        if unicodedata.normalize("NFC", chr(base) + chr(mark)) != c:
            continue
        keys.append(base * _KEY_SHIFT + mark)
        vals.append(comp)
    return keys, vals


_CMAP_KEYS, _CMAP_VALS = _compose_pairs()


def _cmap() -> Column:
    # one map literal (two array literals), broadcast with the plan
    return F.map_from_arrays(F.lit(_CMAP_KEYS), F.lit(_CMAP_VALS))


def _ccc_pairs() -> tuple[list[int], list[int]]:
    """Combining-class table (cp -> ccc) for every codepoint with a
    nonzero canonical combining class — 912 entries, full range (astral
    marks like U+1D165.. included so blocking is judged correctly
    everywhere). ~0.2 s one-time scan at import, per Python process."""
    import sys

    keys, vals = [], []
    for cp in range(0x300, sys.maxunicode + 1):
        c = unicodedata.combining(chr(cp))
        if c:
            keys.append(cp)
            vals.append(c)
    return keys, vals


_CCC_KEYS, _CCC_VALS = _ccc_pairs()


def _cccmap() -> Column:
    return F.map_from_arrays(F.lit(_CCC_KEYS), F.lit(_CCC_VALS))


# --------------------------------------------------------------------------
# codepoint <-> string plumbing (BMP in, full range out)
# --------------------------------------------------------------------------


def string_to_cps(s: Column) -> Column:
    """Codepoint array of a string — full range: Java regex split("")
    is code-POINT aware (astral chars stay whole) and Spark's ascii()
    returns codePointAt(0), so emoji labels (xn--ls8h → 💩) round-trip
    exactly (probed, pinned by test)."""
    return F.transform(
        F.filter(F.split(s, ""), lambda c: c != ""), lambda c: F.ascii(c)
    )


def _cp_utf8_hex(cp: Column) -> Column:
    """UTF-8 byte sequence of one codepoint as uppercase hex (1-4
    bytes). All arithmetic < 2^21, so double division is exact.

    TOTAL over arbitrary ints: negative, surrogate (U+D800..DFFF), and
    > U+10FFFF inputs encode as U+FFFD (EFBFBD) instead of emitting
    invalid UTF-8 that would make ``F.decode`` throw — the 4-byte
    branch is capped at the Unicode ceiling, it no longer swallows any
    out-of-range int a buggy or adversarial caller produces."""

    def b(x):  # hex of one byte value >= 0x80 (always 2 digits)
        return F.hex(x.cast("long"))

    c0 = cp.cast("long")
    bad = (
        (c0 < 0) | (c0 > 0x10FFFF) | ((c0 >= 0xD800) & (c0 <= 0xDFFF))
    )
    c = F.when(bad, F.lit(0xFFFD).cast("long")).otherwise(c0)
    return (
        F.when(c < 0x80, F.lpad(F.hex(c), 2, "0"))
        .when(
            c < 0x800,
            F.concat(b(192 + F.floor(c / 64)), b(128 + c % 64)),
        )
        .when(
            c < 0x10000,
            F.concat(
                b(224 + F.floor(c / 4096)),
                b(128 + F.floor(c / 64) % 64),
                b(128 + c % 64),
            ),
        )
        .otherwise(
            F.concat(
                b(240 + F.floor(c / 262144)),
                b(128 + F.floor(c / 4096) % 64),
                b(128 + F.floor(c / 64) % 64),
                b(128 + c % 64),
            )
        )
    )


def cps_to_string(cps: Column) -> Column:
    """String from a codepoint array, via the UTF-8 hex rendering (the
    only JVM-side codepoint→char path that covers the full range —
    ``char()`` is mod-256)."""
    return F.decode(
        F.unhex(F.array_join(F.transform(cps, _cp_utf8_hex), "")), "UTF-8"
    )


# --------------------------------------------------------------------------
# Canonical composition fold
# --------------------------------------------------------------------------


def nfc_compose_cps(cps: Column) -> Column:
    """Compose a canonically-ordered codepoint array (NFC's composition
    step, UAX #15 D117): the last STARTER is tracked separately from
    the buffer of marks that failed to compose after it, so a starter
    can still absorb a LATER mark across lower-ccc non-composing marks
    — e + U+0339 (ccc 220, no composite) + U+0301 (ccc 230) composes to
    é + U+0339 exactly like real NFC (and DuckDB's nfc_normalize, which
    the oracles use). Blocking is the real rule: a mark is blocked iff
    an intervening character has ccc 0 or ccc ≥ its own — with
    canonically-ordered input that reduces to "last buffered mark's ccc
    ≥ this mark's ccc"; a second starter is blocked by ANY intervening
    mark (non-empty buffer). Composition with the starter is iterative
    (base+dot→ẹ, then ẹ+circ→ệ).

    Hangul composes ARITHMETICALLY (Unicode §3.12 — the algorithmic
    part of NFC the pair map deliberately excludes): a leading jamo L
    (U+1100..1112) plus vowel V (U+1161..1175) forms the LV syllable
    0xAC00 + ((L-0x1100)·21 + (V-0x1161))·28, and an LV syllable plus
    trailing jamo T (U+11A8..11C2) adds T-0x11A7 — two closed-form
    branches in the same fold (V and T are ccc-0, so they ride the
    starter branch and the empty-buffer blocking rule applies, as the
    standard requires).

    Total over arbitrary int arrays: codepoints outside the ccc table
    are ccc 0 (starters), pairs outside the map don't compose, and the
    downstream hex rendering maps invalid codepoints to U+FFFD."""
    cmap = _cmap()
    cccmap = _cccmap()
    init = F.struct(
        F.array().cast("array<int>").alias("out"),
        F.lit(0).alias("st"),
        F.lit(False).alias("has"),
        F.array().cast("array<int>").alias("marks"),
        F.lit(0).alias("lc"),
    )

    def flushed(acc):  # out ++ starter (if any) ++ pending marks
        return F.concat(
            F.when(
                acc["has"], F.concat(acc["out"], F.array(acc["st"]))
            ).otherwise(acc["out"]),
            acc["marks"],
        )

    def step(acc, cp):
        # The ccc lookup and the raw pair-map lookup each embed a
        # ~1k-entry literal table; bind BOTH once as lambda variables of
        # a one-element transform (the SCALE_NOTES §10 hot-subtree
        # binding) — the branch logic below referenced the map-bearing
        # `comp` ~6 times and `ccc` 3 times, which duplicated the table
        # literals into a ~170k-char step body that Catalyst re-analyzed
        # per invocation (r14: the whole canonicalizer's driver-side
        # planning, not row work, dominated the web queries). Same
        # values, same types, tree now linear in the table size.
        ccc0 = F.coalesce(
            F.element_at(cccmap, cp.cast("int")), F.lit(0)
        )
        st = acc["st"]
        comp0 = F.element_at(
            cmap, st.cast("long") * _KEY_SHIFT + cp.cast("long")
        )

        def body(t):
            ccc = t["c"]
            # Hangul L+V -> LV (both closed-form; no map entries exist)
            is_lv = (
                (st >= 0x1100) & (st <= 0x1112)
                & (cp >= 0x1161) & (cp <= 0x1175)
            )
            lv = F.lit(0xAC00) + ((st - 0x1100) * 21 + (cp - 0x1161)) * 28
            # Hangul LV+T -> LVT (st must be an LV syllable: T index 0)
            is_lvt = (
                (st >= 0xAC00) & (st <= 0xD7A3)
                & ((st - 0xAC00) % 28 == 0)
                & (cp >= 0x11A8) & (cp <= 0x11C2)
            )
            lvt = st + cp - 0x11A7
            comp = F.when(
                t["m"].isNotNull(), t["m"]
            ).when(is_lv, lv).when(is_lvt, lvt)
            can = acc["has"] & comp.isNotNull()
            starter_case = F.when(
                can & (F.size(acc["marks"]) == 0),  # unblocked starter pair
                F.struct(
                    acc["out"].alias("out"),
                    comp.alias("st"),
                    F.lit(True).alias("has"),
                    acc["marks"].alias("marks"),
                    F.lit(0).alias("lc"),
                ),
            ).otherwise(
                F.struct(
                    flushed(acc).alias("out"),
                    cp.alias("st"),
                    F.lit(True).alias("has"),
                    F.array().cast("array<int>").alias("marks"),
                    F.lit(0).alias("lc"),
                )
            )
            mark_case = F.when(
                can & (acc["lc"] < ccc),  # not blocked: compose w/ starter
                F.struct(
                    acc["out"].alias("out"),
                    comp.alias("st"),
                    F.lit(True).alias("has"),
                    acc["marks"].alias("marks"),
                    acc["lc"].alias("lc"),
                ),
            ).otherwise(
                F.struct(
                    acc["out"].alias("out"),
                    acc["st"].alias("st"),
                    acc["has"].alias("has"),
                    F.concat(acc["marks"], F.array(cp)).alias("marks"),
                    ccc.alias("lc"),
                )
            )
            return F.when(ccc == 0, starter_case).otherwise(mark_case)

        return F.element_at(
            F.transform(
                F.array(F.struct(ccc0.alias("c"), comp0.alias("m"))), body
            ),
            1,
        )

    return F.aggregate(cps, init, step, flushed)


def nfc_compose(s: Column) -> Column:
    """Compose a canonically-ordered BMP string to its NFC form.

    Fast path: ASCII strings are NFC by definition — one rlike skips
    the per-char composition fold (whose map lookup is a linear scan
    over the ~1k-pair literal), so only the rows that can actually
    change pay for it."""
    return F.when(s.rlike(_ASCII_RE), s).otherwise(
        cps_to_string(nfc_compose_cps(string_to_cps(s)))
    )


# --------------------------------------------------------------------------
# Punycode decode fold (RFC 3492 §6.2)
# --------------------------------------------------------------------------

_BASE = 36
_TMIN, _TMAX = 1, 26
_SKEW, _DAMP = 38, 700
_INITIAL_BIAS, _INITIAL_N = 72, 128


def _adapt(delta: Column, numpoints: Column, firsttime: Column) -> Column:
    """RFC 3492 §6.1 bias adaptation; the spec's while-loop becomes a
    bounded F.aggregate over a 6-step dummy sequence (delta ≤ 2^31
    shrinks below 455 in ≤5 divisions by 35). A fold, NOT a Python-side
    unroll: reassigning ``d = when(d > 455, d/35).otherwise(d)`` embeds
    three copies of the old tree per step — 3^6 expression blowup that
    took Catalyst minutes; the fold's lambda variable keeps the tree
    linear (the same discipline as SCALE_NOTES §10)."""
    d0 = (
        F.when(firsttime, F.floor(delta / _DAMP))
        .otherwise(F.floor(delta / 2))
        .cast("long")
    )
    thresh = ((_BASE - _TMIN) * _TMAX) // 2  # 455
    st = F.aggregate(
        F.sequence(F.lit(1), F.lit(6)),
        F.struct(
            (d0 + F.floor(d0 / numpoints).cast("long")).alias("d"),
            F.lit(0).alias("k"),
        ),
        lambda acc, _i: F.when(
            acc["d"] > thresh,
            F.struct(
                F.floor(acc["d"] / (_BASE - _TMIN)).cast("long").alias("d"),
                (acc["k"] + _BASE).alias("k"),
            ),
        ).otherwise(acc),
    )
    return (
        st["k"] + F.floor((_BASE - _TMIN + 1) * st["d"] / (st["d"] + _SKEW))
    ).cast("int")


def _insert_at(out: Column, pos: Column, cp: Column) -> Column:
    """Insert cp at 0-based pos of an int array (one transform over
    1..size+1 — punycode's only array mutation)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(out) + 1),
        lambda j: F.when(j <= pos, F.element_at(out, j))
        .when(j == pos + 1, cp)
        .otherwise(F.element_at(out, j - 1)),
    )


_MAX_W = 1 << 48  # w cap: digit·w then stays < 2^54 — exact in long


def punycode_decode_cps(ext: Column, basic_cps: Column) -> Column:
    """Decode the extended part of a punycode label (the digits after
    the last delimiter) into the full codepoint array, starting from
    the basic (ASCII) codepoints. One F.aggregate fold whose
    accumulator IS the RFC 3492 decoder state; every intermediate fits
    in 2^53 for any label the guards admit, so the floored double
    divisions are exact.

    VALIDITY-GUARDED (the crawl-facing hardening): a syntactically
    well-formed but semantically malformed label — e.g. all-'z' digits
    whose variable-length integer overflows i, or deltas that decode to
    codepoints past U+10FFFF or into the surrogate block — trips the
    accumulator's ``ok`` flag instead of wrapping negative and emitting
    garbage; the fold then freezes and the finisher returns NULL, which
    ``decode_idn_label`` turns into the RFC-standard literal
    pass-through of the undecodable ACE label. One adversarial URL can
    no longer abort the job (it used to reach F.decode as invalid
    UTF-8 and throw MALFORMED_CHARACTER_CODING)."""
    chars = F.filter(F.split(ext, ""), lambda c: c != "")
    init = F.struct(
        basic_cps.cast("array<int>").alias("out"),
        F.lit(_INITIAL_N).alias("n"),
        F.lit(0).alias("i"),
        F.lit(_INITIAL_BIAS).alias("bias"),
        F.lit(1).cast("long").alias("w"),
        F.lit(_BASE).alias("k"),
        F.lit(0).alias("oldi"),
        F.lit(True).alias("ok"),
    )

    def step(acc, c):
        a = F.ascii(c)
        digit = (
            F.when((a >= 97) & (a <= 122), a - 97)
            .when((a >= 48) & (a <= 57), a - 22)  # '0'-'9' → 26-35
            .otherwise(F.lit(0))
        )
        # exact in long: i < 2^31 (guarded), digit ≤ 35, w ≤ 2^48
        i2l = acc["i"].cast("long") + digit.cast("long") * acc["w"]
        i2 = i2l.cast("int")
        kb = acc["k"] - acc["bias"]
        t = (
            F.when(kb < _TMIN, F.lit(_TMIN))
            .when(kb > _TMAX, F.lit(_TMAX))
            .otherwise(kb)
        )
        np_ = F.size(acc["out"]) + 1
        # n is range-checked in LONG before the int cast — an int-wrapped
        # negative would otherwise slip past the `> 0x10FFFF` guard
        n2l = acc["n"].cast("long") + F.floor(i2 / np_)
        n2 = n2l.cast("int")
        i3 = (i2 % np_).cast("int")
        # RFC 3492 §6.4 overflow handling, made explicit: i past 2^31-1,
        # w past the exactness cap, or a decoded codepoint outside
        # (0, 0x10FFFF] / inside the surrogate block → invalid label
        w2 = acc["w"] * (_BASE - t).cast("long")
        bad_done = (
            (n2l > 0x10FFFF) | ((n2l >= 0xD800) & (n2l <= 0xDFFF))
        )
        done = F.struct(
            _insert_at(acc["out"], i3, n2).alias("out"),
            n2.alias("n"),
            (i3 + 1).alias("i"),
            _adapt(
                (i2 - acc["oldi"]).cast("long"), np_, acc["oldi"] == 0
            ).alias("bias"),
            F.lit(1).cast("long").alias("w"),
            F.lit(_BASE).alias("k"),
            (i3 + 1).alias("oldi"),
            (~bad_done).alias("ok"),
        )
        cont = F.struct(
            acc["out"].alias("out"),
            acc["n"].alias("n"),
            i2.alias("i"),
            acc["bias"].alias("bias"),
            w2.alias("w"),
            (acc["k"] + _BASE).alias("k"),
            acc["oldi"].alias("oldi"),
            (w2 <= _MAX_W).alias("ok"),
        )
        nxt = F.when(
            i2l > 0x7FFFFFFF,  # i overflow: invalid regardless of branch
            F.struct(
                acc["out"].alias("out"),
                acc["n"].alias("n"),
                acc["i"].alias("i"),
                acc["bias"].alias("bias"),
                acc["w"].alias("w"),
                acc["k"].alias("k"),
                acc["oldi"].alias("oldi"),
                F.lit(False).alias("ok"),
            ),
        ).otherwise(F.when(digit < t, done).otherwise(cont))
        # once invalid, stay invalid (freeze the state)
        return F.when(acc["ok"], nxt).otherwise(acc)

    # a valid label ends ON an integer boundary (k is reset to _BASE by
    # every completed delta; k > _BASE at end-of-input means the final
    # variable-length integer is incomplete — RFC 3492 §6.2 "fail on
    # end of input in the middle of an integer", the same condition
    # Python's codec reports as "incomplete punycode string")
    return F.aggregate(
        chars,
        init,
        step,
        lambda acc: F.when(acc["ok"] & (acc["k"] == _BASE), acc["out"]),
    )


def decode_idn_label(label: Column) -> Column:
    """Canonical Unicode form of ONE lowercase host label: an ``xn--``
    ACE label with a well-formed extended part decodes via the punycode
    fold; everything else passes through; both sides then compose to
    NFC — so the precomposed, decomposed, and ACE spellings of one
    label land on a single canonical string."""
    body = F.substr(label, F.lit(5))
    rev_dash = F.instr(F.reverse(body), "-")
    blen = F.when(rev_dash > 0, F.length(body) - rev_dash).otherwise(
        F.lit(0)
    )
    basic = F.substr(body, F.lit(1), blen)
    ext = F.substr(
        body, blen + F.when(rev_dash > 0, F.lit(2)).otherwise(F.lit(1))
    )
    # a trailing delimiter with an EMPTY extended part is the RFC's
    # all-basic form ("xn--y-" → "y"); otherwise every extended char
    # must be a punycode digit or the label passes through literally
    ext_ok = (
        (F.length(ext) > 0)
        & F.forall(
            F.filter(F.split(ext, ""), lambda c: c != ""),
            lambda c: (
                ((F.ascii(c) >= 97) & (F.ascii(c) <= 122))
                | ((F.ascii(c) >= 48) & (F.ascii(c) <= 57))
            ),
        )
    ) | ((F.length(ext) == 0) & (rev_dash > 0))
    is_ace = label.startswith("xn--") & ext_ok
    cps = F.when(
        is_ace, punycode_decode_cps(ext, string_to_cps(basic))
    ).otherwise(string_to_cps(label))
    # a semantically invalid ACE label (decoder tripped its ok guard →
    # NULL cps, which the compose fold and hex render propagate) passes
    # through LITERALLY — RFC-standard handling of undecodable labels
    return F.coalesce(cps_to_string(nfc_compose_cps(cps)), label)


_ASCII_RE = r"^[\x00-\x7F]*$"  # identical semantics in Java regex and RE2


def canonical_idn_host(host: Column) -> Column:
    """Per-label IDN decode + NFC composition of a lowercase, port-free
    host: split on dots, decode each label, rejoin.

    Fast path: a pure-ASCII host with no ``xn--`` label is already its
    canonical form — one cheap rlike/contains test skips the per-char
    folds entirely. At web scale the overwhelming majority of hosts
    take this branch (the IDN share of real crawls is low single-digit
    percent), so the decoder's per-char cost is paid only where it can
    matter. Measured: the fold-always form made the canonicalize query
    3.8× slower; the guarded form returns it to the pre-IDN cost."""
    plain = host.rlike(_ASCII_RE) & ~host.contains("xn--")
    return F.when(plain, host).otherwise(
        F.array_join(
            F.transform(F.split(host, r"\."), decode_idn_label), "."
        )
    )
