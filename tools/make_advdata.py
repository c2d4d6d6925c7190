#!/usr/bin/env python3
"""Build the ADVERSARIAL testdata dir used by the r8 null/tie/degenerate
walk: a copy of a base SF dir with hostile rows appended to documents
(null / empty / whitespace-only / single-char / repeated-token /
duplicate text) and events (tied timestamps, null user_id, a
constant-value series, a singleton event type, a null value).

Usage: python3 tools/make_advdata.py [base_sf_dir] [out_dir]
Then:  sbt "runMain graft.Verify <out_dir> <dump_dir>"
       python3 tools/compare.py <out_dir> <dump_dir>

Every cross-engine divergence this surfaces is a real finding: either
an engine crash (r8: null-text media payload NPE), a population
mismatch (r8: HLL ignores null users, the exact leg counted them), or
an oracle that silently disagrees with the engine on edge rows (r8:
seven null-text semantic misalignments).

The unicode axis (added late r8) deliberately BREAKS the byte==codepoint
assumption: astral emoji (surrogate pairs in UTF-16, 4-byte UTF-8), NFC
vs NFD combining-mark pairs, CJK spaceless text, RTL Arabic, case-fold
traps (ß, Turkish İ/ı), unicode whitespace variants (NBSP, U+2028,
U+3000), and escaped-surrogate JSON payloads — every place where a
kernel counting bytes, UTF-16 units, or codepoints could diverge from
the oracle's utf8proc view.
"""
import sys, os, shutil, datetime as dt
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
dst = sys.argv[2] if len(sys.argv) > 2 else '/root/repo/target/advdata'

shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
for f in os.listdir(src):
    if f not in ('documents.parquet', 'events.parquet', 'embeddings.parquet'):
        shutil.copy(f'{src}/{f}', f'{dst}/{f}')

# embeddings: the float-ordering traps — an all-zeros vector (cosine
# 0/0), an exact duplicate of the flagship query vector vec_id=0
# (distance ties at the top of every funnel), its exact negation
# (cosine -1 pole), and an extreme-magnitude vector at the EDGE of the
# validated ingest domain (|x| <= Metric.MaxAbsComponent = 100; values
# beyond it are quarantined at the door precisely because they would
# long-overflow the exact-quantized dashboards — the r8 finding that
# produced the validRecord gate). Appended with high ids so the
# fixed-model contracts (centroids = vec_id < 8, codebooks < 16, query
# = vec_id 0) are untouched.
emb = pq.read_table(f'{src}/embeddings.parquet')
dim = len(emb.column('embedding')[0])
v0 = [float(x) for x in emb.column('embedding')[0].as_py()]
adv_emb = pa.table({
    'vec_id': [900001, 900002, 900003, 900004, 900005, 900006],
    'embedding': [
        [0.0] * dim,                 # zero vector
        v0,                          # exact tie with the query vector
        [-x for x in v0],            # exact negation
        [100.0] * dim,               # extreme in-domain magnitude (the edge)
        # float-edge lanes: NEGATIVE zero (sign-sensitive kernels — the
        # 1-bit sign codes use x > 0, so ±0.0 must land identically on
        # both engines) and subnormal/tiny components (IEEE gradual
        # underflow; squared terms flush to 0.0 identically under
        # double arithmetic on both engines; all values float32-
        # representable — a double-only subnormal would flush to plain
        # 0.0 at the list<float> parquet write and probe nothing)
        [-0.0] * dim,
        [1.4e-45, -1.4e-45, 1e-40, 1e-30] + [0.0] * (dim - 4),
    ],
    'label': [0, 1, 2, 3, 4, 5],
}, schema=emb.schema)
pq.write_table(pa.concat_tables([emb, adv_emb]), f'{dst}/embeddings.parquet')

d = pq.read_table(f'{src}/documents.parquet')
# a VERY LONG document (~120 KB, ~20k tokens): catches quadratic text
# kernels and window-census blow-ups that short fixtures never exercise;
# deterministic word stream so both engines tokenize identically
long_text = ' '.join(f'w{i % 997}' for i in range(20000))
# word-free but NON-empty texts: tokens exist yet alpha-word counts are
# zero — a different division-guard path than the empty/whitespace rows
# (mean word length, stopword ratio, readability syllables all see a
# populated token list with nothing countable in it)
punct_text = '!!! ??? ... ;;; ::: --- ((( ))) *** &&&'
digit_text = '123 456 789 000 111 222 333 444 555 666'
char_rep = 'a' * 5000
# unicode axis: texts that break byte==codepoint==UTF-16-unit equalities.
# python len() is codepoints, matching Spark length() and DuckDB length().
uni_texts = [
    # astral emoji (4-byte UTF-8, surrogate pair in UTF-16) mixed with words
    'rocket \U0001F680 launch \U0001F600 smile \U0001F680 again',
    # NFC vs NFD pair: same rendered text, different codepoints — exact
    # dedup must see them as DISTINCT on both engines
    'caf\u00e9 norm caf\u00e9 norm',  # NFC (escape keeps the source ASCII-safe)
    'cafe\u0301 norm cafe\u0301 norm',  # NFD: same rendering, different codepoints
    # CJK, no ASCII spaces at all (whitespace tokenizers see ONE token)
    '日本語のテキストです。'
    '漢字と仮名が混在する文。',
    # RTL Arabic with spaces
    'مرحبا بالعالم'
    ' هذا نص عربي',
    # case-fold traps: ß (upper→SS in Java, ẞ in utf8proc?), Turkish İ/ı,
    # and a mixed-case Greek word (final sigma lowercasing)
    'straße STRASSE İstanbul ışık ΣΟΦΟΣ σοφός',
    # unicode whitespace variants BETWEEN ascii words: NBSP, line sep,
    # ideographic space, zero-width space — ASCII tokenizers keep these
    # glued into single tokens on both engines (or not — that is the probe)
    'aa bb cc dd ee　ff gg​hh',
    # combining-heavy zalgo-ish cluster + an emoji ZWJ family sequence
    'ź̂̃̄alg̀o \U0001F468‍\U0001F469‍\U0001F467 end',
]
# payload-collision probe: 'a' (U+0061) vs the codepoint-congruent
# 's-caron' (U+0161 — same low byte) at an id with the same kind
# (doc_id % 3): DISTINCT texts, IDENTICAL codepoint-mod-256 media
# payload — media_dedup must merge them while text dedup keeps both
uni_texts.append('\u0161')
# code-shaped doc: symbol-dense, indented, statement-terminated lines —
# the text_code_detect verdict must fire (is_code=1) on both engines,
# while every prose doc in the corpus stays 0
uni_texts.append(
    'int main() {\n'
    '    int x = compute(4);\n'
    '    if (x > 0) {\n'
    '        emit(x);\n'
    '    }\n'
    '    return x;\n'
    '}')
uni_ids   = [900013 + i for i in range(len(uni_texts))]
uni_langs = ['en', 'fr', 'fr', 'ja', 'ar', 'de', 'en', 'en', 'en', 'en']
uni_srcs  = ['advemoji', 'advnfc', 'advnfd', 'advcjk', 'advrtl',
             'advcase', 'advuws', 'advzalgo', 'advbyte', 'advcode']

# perceptual NEAR-dup image pair (r10 advice: media_phash_pairs matched
# the oracle with 0 rows on the default sf0.01 gate, leaving the banded
# xor/verify path vacuously green): two EVEN doc_ids (codecMedia: even →
# P6 PPM image) with n_chars = 100 → an 8×8 raster, so every grid-8
# aHash block is exactly one pixel. Text A is a period-4 luminance
# pattern ('!!zz': lum alternates 221/399, global mean 310); text B
# changes ONE byte at position 65 ('!' 0x21 → 'ÿ' U+00FF = byte 255),
# which feeds only pixel 63's lum (bytes 65/64/63 feed pixels 65/64/63,
# and 64/65 are out of the 64-pixel raster) lifting it 221 → 443 across
# the mean — exactly one aHash bit flips, hamming 1 ≤ 2, while the
# payload bytes differ (not an exact-dup pair). The mirror below
# re-derives both hashes with the engine's exact integer arithmetic and
# asserts the distance, so a codec or layout change cannot silently
# devacuate the fixture.
def _ahash(text, grid=8):
    src = [ord(c) % 256 for c in text]
    nc = len(text)
    w, h = nc % 16 + 4, nc % 12 + 4
    n, L = w * h, len(src)
    bs, bc, t = [0] * (grid * grid), [0] * (grid * grid), 0
    for i in range(n):
        lum = src[i % L] + 2 * src[(i + 1) % L] + src[(i + 2) % L]
        b = (i // w * grid // h) * grid + (i % w * grid // w)
        bs[b] += lum
        bc[b] += 1
        t += lum
    hv = 0
    for k in range(grid * grid):
        if bc[k] > 0 and bs[k] * n >= t * bc[k]:
            hv |= 1 << k
    return hv


phash_a = '!!zz' * 25
phash_b = phash_a[:65] + 'ÿ' + phash_a[66:]
_pd = bin(_ahash(phash_a) ^ _ahash(phash_b)).count('1')
assert 1 <= _pd <= 2, f'phash fixture pair drifted to hamming {_pd}'

adv_docs = {
    'doc_id':  [900001, 900002, 900003, 900004, 900005, 900006, 900007,
                900008, 900009, 900010, 900011, 900012] + uni_ids
               + [900024, 900026],
    'text':    [None, '', 'a', '   ', 'x x x x x x x x x x',
                'the quick brown fox', 'the quick brown fox', '\t\n  \n\t',
                long_text, punct_text, digit_text, char_rep] + uni_texts
               + [phash_a, phash_b],
    'lang':    [None, 'en', 'en', 'en', 'en', 'en', 'en', 'en', 'en',
                'en', 'en', 'en'] + uni_langs + ['en', 'en'],
    'source':  ['advnull', 'advempty', 'adv1', 'advws', 'advrep',
                'advdup', 'advdup', 'advws', 'advlong', 'advpunct',
                'advdigit', 'advchar'] + uni_srcs
               + ['advphash', 'advphash'],
    'n_chars': [0, 0, 1, 3, 19, 19, 19, 6, len(long_text),
                len(punct_text), len(digit_text), len(char_rep)]
               + [len(t) for t in uni_texts] + [100, 100],
}
pq.write_table(
    pa.concat_tables([d, pa.table(adv_docs, schema=d.schema)]),
    f'{dst}/documents.parquet')

e = pq.read_table(f'{src}/events.parquet')
ts0 = dt.datetime(2024, 3, 1, 12, 0, 0)
rows = [
    # tied timestamps: same user, same ts, different event_id/type
    (900001, ts0, 777001, 'view', 1.0, '{}'),
    (900002, ts0, 777001, 'click', 2.0, '{}'),
    # null user
    (900003, ts0 + dt.timedelta(seconds=5), None, 'view', 3.0, '{}'),
]
# constant-value series (degenerate variance)
rows += [(900010 + i, ts0 + dt.timedelta(minutes=i), 777002, 'ping', 5.0, '{}')
         for i in range(8)]
rows += [
    # singleton event type
    (900030, ts0 + dt.timedelta(hours=1), 777003, 'advrare', 9.5, '{}'),
    # null value
    (900031, ts0 + dt.timedelta(hours=2), 777003, 'view', None, '{}'),
    # malformed + null props payloads (JSON-parse lanes)
    (900032, ts0 + dt.timedelta(hours=3), 777003, 'view', 1.0, 'not json {'),
    (900033, ts0 + dt.timedelta(hours=3, seconds=1), 777003, 'view', 1.0, None),
    # exact midnight boundary (day/window floor edges)
    (900034, dt.datetime(2024, 3, 2, 0, 0, 0), 777004, 'view', 2.0, '{}'),
    # as-of tolerance boundary: click exactly 3600 s before a purchase
    # (the <= bound is inclusive — the match must SURVIVE), plus one at
    # 3601 s (must be nulled)
    (900040, dt.datetime(2024, 3, 5, 9, 0, 0), 777005, 'click', 1.5, '{}'),
    (900041, dt.datetime(2024, 3, 5, 10, 0, 0), 777005, 'purchase', 20.0, '{}'),
    (900042, dt.datetime(2024, 3, 5, 11, 0, 1), 777005, 'purchase', 30.0, '{}'),
    # unicode JSON lanes: raw astral emoji in a string value, an ESCAPED
    # surrogate pair (the JSON-legal spelling of the same emoji), and an
    # escaped BMP char — extraction must agree cross-engine on all three
    (900050, dt.datetime(2024, 3, 6, 9, 0, 0), 777006, 'view', 1.0,
     '{"page": "café \U0001F680", "n": 1}'),
    (900051, dt.datetime(2024, 3, 6, 9, 1, 0), 777006, 'view', 2.0,
     '{"page": "caf\\u00e9 \\ud83d\\ude80", "n": 2}'),
    (900052, dt.datetime(2024, 3, 6, 9, 2, 0), 777006, 'view', 3.0,
     '{"page": "plain", "n": 3}'),
    # timestamp axis: pre-1970 epoch (negative unix seconds — the
    # truncate-vs-floor division trap for every bucketing/chunking
    # path), a sub-second PRE-epoch instant (negative fractional
    # seconds), a far-future year-2199 row, and a microsecond-adjacent
    # pair straddling a whole-second boundary (floored-seconds
    # tolerance + unix_timestamp truncation probes)
    (900060, dt.datetime(1969, 12, 31, 22, 0, 0), 777007, 'view', 1.0, '{}'),
    (900061, dt.datetime(1969, 12, 31, 23, 59, 59, 500000), 777007, 'click', 2.0, '{}'),
    (900062, dt.datetime(1970, 1, 1, 0, 30, 0), 777007, 'purchase', 5.0, '{}'),
    (900063, dt.datetime(2199, 12, 31, 23, 59, 59, 999999), 777008, 'view', 1.0, '{}'),
    (900064, dt.datetime(2024, 6, 1, 0, 0, 0, 999999), 777009, 'view', 1.0, '{}'),
    (900065, dt.datetime(2024, 6, 1, 0, 0, 1, 0), 777009, 'click', 1.0, '{}'),
    # hostile props lanes: malformed JSON, a JSON literal that is valid
    # but not an object, and a non-object array — the props contract
    # ("NULL or a JSON object") must classify all three as violations
    # on both engines while the extraction queries yield NULL fields
    (900070, dt.datetime(2024, 6, 2, 9, 0, 0), 777010, 'view', 1.0, '{"broken'),
    (900071, dt.datetime(2024, 6, 2, 9, 1, 0), 777010, 'view', 1.0, 'null'),
    (900072, dt.datetime(2024, 6, 2, 9, 2, 0), 777010, 'view', 1.0, '[1, 2]'),
    # session-gap boundary (the probe that exposed the session_window
    # vs lag->= divergence): the settled repo convention is Spark's
    # session_window semantics — an event EXACTLY gap (1800 s) after
    # the previous one MERGES into the session; only a strictly greater
    # gap (1801 s) starts a new one. Sessions here: {view, click,
    # purchase} (gaps 1799, 1800) then {error} (gap 1801) — a >= lag
    # comparison on either engine splits the first session and trips
    # sessionize/session_stats/affinity/paths
    (900080, dt.datetime(2024, 6, 3, 9, 0, 0), 777011, 'view', 1.0, '{}'),
    (900081, dt.datetime(2024, 6, 3, 9, 29, 59), 777011, 'click', 2.0, '{}'),
    (900082, dt.datetime(2024, 6, 3, 9, 59, 59), 777011, 'purchase', 3.0, '{}'),
    (900083, dt.datetime(2024, 6, 3, 10, 30, 0), 777011, 'error', 4.0, '{}'),
    # NEGATIVE user id: the sign-sensitive-mod probe (Count-Min hash
    # rows, any % bucketing) — Spark's % and DuckDB's % both keep the
    # dividend's sign, so every hash/bucket formula must spell out pmod
    # ((x % p + p) % p) on BOTH sides or the engines agree with each
    # other but put the key in a NEGATIVE cell index
    (900090, dt.datetime(2024, 6, 4, 9, 0, 0), -7, 'view', 1.0, '{}'),
    (900091, dt.datetime(2024, 6, 4, 9, 5, 0), -7, 'click', 2.0, '{}'),
    (900092, dt.datetime(2024, 6, 4, 9, 10, 0), -7, 'purchase', 3.0, '{}'),
]
# whale key: ONE user holding a 300-event burst spread across 3 days
# (crosses the 86400 s chunk boundary of the segmented as-of path) with
# heavy timestamp ties (4 events per instant) — the skew regime the
# chunked/windowed operators exist for, at a size every LATERAL-replay
# oracle can still afford
rows += [(910000 + i,
          dt.datetime(2024, 3, 10, 0, 0, 0)
            + dt.timedelta(minutes=20 * (i // 4)),
          777999,
          ['view', 'click', 'purchase', 'error'][i % 4],
          float(i % 7),
          '{}')
         for i in range(300)]
adv_e = pa.table(
    {'event_id': [r[0] for r in rows], 'ts': [r[1] for r in rows],
     'user_id': [r[2] for r in rows], 'event_type': [r[3] for r in rows],
     'value': [r[4] for r in rows], 'props': [r[5] for r in rows]},
    schema=e.schema)
pq.write_table(pa.concat_tables([e, adv_e]), f'{dst}/events.parquet')

# relational axis (late r8): the TPC-H tables were copied verbatim until
# now, so the 5 sales_/supplier_/parts_ queries never saw a hostile row.
# Probes: NULL group keys (segment/brand), NULL measures inside existing
# groups (sum skips them on both engines, count(*) does not), orphan
# orders / childless orders (inner joins drop identically), a negative-
# revenue return line, and an EXACT revenue tie at the top of
# top_customers so the custkey tiebreak is pinned in data, not just SQL.
def _append(name, rows_dict):
    t = pq.read_table(f'{src}/{name}.parquet')
    extra = pa.table(rows_dict, schema=t.schema)
    pq.write_table(pa.concat_tables([t, extra]), f'{dst}/{name}.parquet')

_append('customer', {
    'c_custkey':    [980001, 980002, 980003, 980004],
    'c_name':       ['Adv Tie A', 'Adv Tie B', None, 'Adv NullSeg'],
    'c_nationkey':  [0, 0, 1, None],          # 980004: null nation drops from nation join
    'c_acctbal':    [0.0, 0.0, None, -999.99],
    'c_mktsegment': ['BUILDING', 'BUILDING', 'MACHINERY', None],
})

# Fuzzy-match axis: hostile names INSIDE the fuzzy_* custkey bound
# (< 2500) at keys 2000+ — collision-free against the organic custkeys
# of BOTH supported bases (sf0.001 tops out at 149, sf0.01 at 1499).
# An sf0.1 base would collide (organic keys reach 14999): c_custkey is
# a PRIMARY KEY the relational queries rely on (a duplicated key makes
# fan-out-counting engines and DISTINCT-counting oracles legitimately
# disagree), so this script supports sf0.001/sf0.01 bases only.
# Probes: a null name (matches nothing), an exact duplicate pair
# (dist 0), a dist-1 and an EXACTLY-at-the-boundary dist-3 pair (must
# NOT match), a multibyte substitution (é = 2 byte edits — in at
# maxDist 2 under BYTE semantics, and a codepoint-counting engine
# would score it 1), an NFD name whose NFC twin is also present (the
# NFC-normalize front step makes them dist 0; raw bytes would be 3
# apart), a name differing only in ONE case flip (dist 1 — case is
# content), and a 30-codepoint name pair (excluded by the length<=24
# exactness bound on BOTH engines even though their distance is 1).
_append('customer', {
    'c_custkey':    [2000, 2001, 2002, 2003, 2004, 2005, 2006, 2007, 2008,
                     2009, 2010, 2011],
    'c_name':       ['Fuzzy Probe Alpha', 'Fuzzy Probe Alpha',   # dup: dist 0
                     'Fuzzy Probe Alphq',                        # dist 1 to 200/201
                     'Fuzzy Prode Alphx Z',                      # dist 3+ to 200: out
                     'Fuzzy Probé Alpha',                        # é: byte dist 2 to 200
                     'Caf\u00e9 Corner',                       # NFC é (escape-explicit)
                     'Cafe\u0301 Corner',                      # NFD e+combining acute -> NFC-equal to 205
                     'fuzzy Probe Alpha',                        # one case flip: dist 1
                     None,                                       # null name: no matches
                     'Unrelated Entirely Q',                     # singleton: no matches
                     'A Very Long Name Exceeding 24cp',          # 31 cp: length-excluded
                     'A Very Long Name Exceeding 24cq'],         # its dist-1 twin
    'c_nationkey':  [0, 0, 1, 0, 0, 2, 2, 0, 3, 3, 4, 4],
    'c_acctbal':    [1.0] * 12,
    'c_mktsegment': ['BUILDING'] * 12,
})
_append('orders', {
    'o_orderkey':   [980101, 980102, 980103, 980104, 980105, 980106],
    # 980103 is an ORPHAN (custkey not in customer); 980106 has NO lines
    'o_custkey':    [980001, 980002, 979999, 980003, 980004, 980001],
    'o_orderstatus': ['F', 'F', 'O', 'O', 'F', 'F'],
    'o_totalprice': [1000.0, 1000.0, 50.0, None, 10.0, 0.0],
    'o_orderdate':  [dt.datetime(2024, 1, 1)] * 6,
    'o_orderpriority': ['1-URGENT'] * 6,
})
_append('lineitem', {
    # two EXACTLY tied revenue lines (the top-customers tie: rev4 =
    # 9e12 quanta = $900M each, far above any sf0.001 organic revenue
    # (~$4.2M max), so the tied pair IS ranks 1-2 and only c_custkey
    # orders them); a negative return line; a NULL-discount line (rev4
    # NULL: summed-over on both engines while count(*) still counts
    # it); an orphan-order line; and a line for the null-segment /
    # null-nationkey customer so the NULL segment group actually
    # carries revenue into sales_by_segment (while dropping out of
    # sales_by_nation's equality join on the null nationkey)
    'l_orderkey':   [980101, 980102, 980104, 980103, 980104, 980105],
    'l_partkey':    [1, 1, 1, 1, 1, 1],
    'l_suppkey':    [1, 1, 1, 1, 1, 1],
    'l_linenumber': [1, 1, 2, 1, 3, 1],
    'l_quantity':   [1.0, 1.0, -3.0, 1.0, 2.0, 1.0],
    'l_extendedprice': [900000000.0, 900000000.0, -500.25, 50.0, 123.45, 77.5],
    'l_discount':   [0.0, 0.0, 0.0, 0.0, None, 0.2],
    'l_tax':        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    'l_returnflag': ['N', 'N', 'R', 'N', 'N', 'N'],
    'l_linestatus': ['F', 'F', 'F', 'O', 'O', 'F'],
    'l_shipdate':   [dt.datetime(2024, 1, 15)] * 6,
})
_append('supplier', {
    # null acctbal inside an existing region group: sum skips, count keeps
    's_suppkey':   [980201, 980202],
    's_name':      ['Adv Supp NullBal', 'Adv Supp NegBal'],
    's_nationkey': [0, 2],
    's_acctbal':   [None, -12.34],
})
_append('part', {
    # null price inside an EXISTING brand (mean = sum-skips-null / count-
    # all on both engines) plus a NULL brand group of its own
    'p_partkey':   [980301, 980302],
    'p_name':      ['adv null price', 'adv null brand'],
    'p_brand':     ['Brand#11', None],
    'p_type':      ['ADV TYPE', 'ADV TYPE'],
    'p_size':      [1, None],
    'p_retailprice': [None, 1.2345],
})
print(f'adversarial dir ready at {dst}')
