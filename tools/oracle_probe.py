import duckdb, sys

sf = '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['embeddings', 'documents', 'events']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def sq(a, b):
    return (f"list_sum(list_transform(list_zip({a}, {b}), "
            f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))")

def dot(a, b):
    return (f"list_sum(list_transform(list_zip({a}, {b}), "
            f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))")

def cos_dist(a, b):
    return f"(1.0 - {dot(a,b)} / (sqrt({dot(a,a)}) * sqrt({dot(b,b)})))"

def cos_sim(a, b):
    return f"({dot(a,b)} / (sqrt({dot(a,a)}) * sqrt({dot(b,b)})))"

STOP_ALL = "['the','a','of','to','and','is','in','it','el','la','de','que','y','en','un','es','le','et','les','des','der','die','das','und','ist','ein','zu','den','shi','bu','zai','ren','you','wo']"

oracles = {}

oracles['knn_euclidean'] = f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS vec_id, round({sq('e.embedding','q.qvec')}, 4) AS distance
FROM embeddings e, q
ORDER BY {sq('e.embedding','q.qvec')} ASC, e.vec_id ASC LIMIT 10"""

oracles['knn_cosine'] = f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS vec_id, round({cos_dist('e.embedding','q.qvec')}, 4) AS distance
FROM embeddings e, q
ORDER BY {cos_dist('e.embedding','q.qvec')} ASC, e.vec_id ASC LIMIT 10"""

oracles['knn_radius'] = f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS vec_id, round({sq('e.embedding','q.qvec')}, 4) AS distance
FROM embeddings e, q
WHERE {sq('e.embedding','q.qvec')} <= 1.7
ORDER BY {sq('e.embedding','q.qvec')} ASC, e.vec_id ASC LIMIT 50"""

oracles['knn_filtered'] = f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS vec_id, round({sq('e.embedding','q.qvec')}, 4) AS distance
FROM embeddings e, q
WHERE e.label >= 5
ORDER BY {sq('e.embedding','q.qvec')} ASC, e.vec_id ASC LIMIT 10"""

oracles['filter_and'] = "SELECT vec_id FROM embeddings WHERE label >= 3 AND label <= 6 ORDER BY vec_id"
oracles['filter_or'] = "SELECT doc_id FROM documents WHERE lang = 'en' OR n_chars < 200 ORDER BY doc_id"
oracles['filter_contains'] = "SELECT doc_id FROM documents WHERE contains(text, 'spark window') ORDER BY doc_id"
oracles['filter_quoted'] = "SELECT doc_id FROM documents WHERE lang = 'fr' ORDER BY doc_id"
oracles['get_by_id'] = "SELECT vec_id, CAST(label AS VARCHAR) AS label FROM embeddings WHERE vec_id = 42"
oracles['count_records'] = "SELECT count(*) AS n_records FROM embeddings"
oracles['insert_batch'] = "SELECT count(*) + 3 AS n, CAST(sum(label) + 273 AS DOUBLE) AS label_sum FROM embeddings"
oracles['delete_batch'] = "SELECT count(*) AS n, CAST(sum(vec_id) AS BIGINT) AS id_sum FROM embeddings WHERE vec_id % 10 <> 0"
oracles['update_metadata'] = """
SELECT vec_id, CASE WHEN vec_id < 10 THEN '99' ELSE CAST(label AS VARCHAR) END AS label
FROM embeddings WHERE vec_id < 20 ORDER BY vec_id"""

oracles['ivf_assignments'] = f"""
WITH c AS (SELECT CAST(vec_id AS INTEGER) AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
d AS (SELECT e.vec_id, c.cid, {sq('e.embedding','c.cvec')} AS dist FROM embeddings e CROSS JOIN c),
r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM d)
SELECT vec_id, cid AS cluster_id FROM r WHERE rn = 1 ORDER BY vec_id"""

oracles['ivf_probe_query'] = f"""
WITH c AS (SELECT CAST(vec_id AS INTEGER) AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
asg AS (SELECT vec_id, cid FROM (
  SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY {sq('e.embedding','c.cvec')} ASC, c.cid ASC) AS rn
  FROM embeddings e CROSS JOIN c) WHERE rn = 1),
probed AS (SELECT c.cid FROM c, q ORDER BY {sq('c.cvec','q.qvec')} ASC, c.cid ASC LIMIT 3)
SELECT e.vec_id AS vec_id, round({sq('e.embedding','q.qvec')}, 4) AS distance
FROM embeddings e JOIN asg ON e.vec_id = asg.vec_id JOIN probed ON asg.cid = probed.cid, q
ORDER BY {sq('e.embedding','q.qvec')} ASC, e.vec_id ASC LIMIT 10"""

oracles['ann_topk_batch'] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
d AS (SELECT q.query_id, e.vec_id, {cos_dist('e.embedding','q.qvec')} AS dist FROM embeddings e CROSS JOIN q),
r AS (SELECT query_id, vec_id, dist, row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rn FROM d)
SELECT query_id, vec_id, round(dist, 4) AS distance FROM r WHERE rn <= 5 ORDER BY query_id, dist, vec_id"""

oracles['dedup_exact'] = "SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY text ORDER BY keep_id"

oracles['dedup_minhash'] = r"""
WITH toks AS (
  SELECT doc_id, list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS sh FROM documents),
ne AS (SELECT doc_id, sh FROM toks WHERE len(sh) > 0),
sig AS (SELECT doc_id, sh, list_transform(generate_series(0, 15), i ->
  list_min(list_transform(sh, s -> md5(CAST(i AS VARCHAR) || ':' || s)))) AS sg FROM ne),
bands AS (SELECT doc_id, sh, u.b AS band_idx,
  md5(array_to_string(list_slice(sg, u.b * 4 + 1, u.b * 4 + 4), '|')) AS band_hash
  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS b) u),
j AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) AS jaccard
  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
SELECT doc_id_a, doc_id_b, round(jaccard, 4) AS jaccard FROM j WHERE jaccard >= 0.5 ORDER BY doc_id_a, doc_id_b"""

oracles['dedup_simhash'] = r"""
WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
h AS (SELECT doc_id, list_transform(t, tk -> list_reduce(
  list_transform(string_split_regex(substr(md5(tk), 1, 15), ''), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
  (a, b) -> a * 16 + b)) AS hs FROM toks),
s AS (SELECT doc_id, list_reduce(list_transform(generate_series(0, 59), b ->
  CASE WHEN list_sum(list_transform(hs, v -> CASE WHEN (v >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
  THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END), (a, b) -> a | b) AS sh FROM h),
banded AS (SELECT doc_id, sh, u.b AS band_idx, (sh >> (u.b * 15)) & 32767 AS band_key
  FROM s, (SELECT unnest([0, 1, 2, 3]) AS b) u),
pairs AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
  FROM banded a JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
SELECT doc_id_a, doc_id_b, hamming FROM pairs WHERE hamming <= 8 ORDER BY doc_id_a, doc_id_b"""

oracles['ngram_jaccard'] = r"""
WITH t AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents)),
q AS (SELECT sh AS qsh FROM t WHERE doc_id = 0)
SELECT t.doc_id AS doc_id,
  round(CAST(len(list_intersect(t.sh, q.qsh)) AS DOUBLE) / len(list_distinct(t.sh || q.qsh)), 4) AS jaccard
FROM t, q WHERE len(list_intersect(t.sh, q.qsh)) > 0 ORDER BY t.doc_id"""

oracles['lang_id'] = r"""
WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
s AS (SELECT doc_id,
  len(list_filter(tk, x -> list_contains(['the','a','of','to','and','is','in','it'], x))) AS e,
  len(list_filter(tk, x -> list_contains(['el','la','de','que','y','en','un','es'], x))) AS sp,
  len(list_filter(tk, x -> list_contains(['le','la','de','et','un','que','les','des'], x))) AS f,
  len(list_filter(tk, x -> list_contains(['der','die','das','und','ist','ein','zu','den'], x))) AS d,
  len(list_filter(tk, x -> list_contains(['de','shi','bu','le','zai','ren','you','wo'], x))) AS z
  FROM t)
SELECT doc_id, CASE WHEN greatest(e, sp, f, d, z) = 0 THEN 'und'
  WHEN e >= sp AND e >= f AND e >= d AND e >= z THEN 'en'
  WHEN sp >= f AND sp >= d AND sp >= z THEN 'es'
  WHEN f >= d AND f >= z THEN 'fr'
  WHEN d >= z THEN 'de' ELSE 'zh' END AS lang_pred
FROM s ORDER BY doc_id"""

oracles['text_stats'] = rf"""
WITH b AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk,
  CAST(length(text) AS DOUBLE) AS nc,
  CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS DOUBLE) AS punct
  FROM documents),
m AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
  CASE WHEN nc > 0 THEN punct / nc ELSE 0.0 END AS punct_ratio,
  CASE WHEN len(tk) > 0 THEN CAST(len(list_filter(tk, x -> list_contains({STOP_ALL}, x))) AS DOUBLE) / len(tk) ELSE 0.0 END AS stop_ratio,
  CASE WHEN len(tk) > 0 THEN list_sum(list_transform(tk, x -> CAST(length(x) AS DOUBLE))) / len(tk) ELSE 0.0 END AS avg_len
  FROM b)
SELECT doc_id, n_tokens,
  round(least(1.0, greatest(0.0, 0.2 + 0.5 * stop_ratio + 0.05 * avg_len - punct_ratio)), 4) AS quality
FROM m ORDER BY doc_id"""

oracles['doc_fingerprint'] = """
SELECT doc_id, md5(text) AS md5_full,
  list_min(list_transform(generate_series(1, greatest(length(text) - 7, 1)), i -> md5(substr(text, i, 8)))) AS min_window_md5
FROM documents ORDER BY doc_id"""

oracles['embed_neardup'] = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos_sim('a.embedding','b.embedding')}, 4) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {cos_sim('a.embedding','b.embedding')} >= 0.2 ORDER BY id_a, id_b"""

oracles['events_window_agg'] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
  count(*) AS n, round(sum(value), 4) AS value_sum
FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""

for name, sql in oracles.items():
    try:
        r = con.execute(sql)
        rows = r.fetchall()
        print(f"{name}: OK {len(rows)} rows; first: {rows[0] if rows else '(empty)'}")
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:200]}")
