"""Training-data pipeline battery: dedup, similarity search, text
analysis, multimodal plumbing — each over the documents/embeddings
tables with a DuckDB oracle.

Sketch operators (MinHash, SimHash, hyperplane LSH) are normally
rows-only checkable; here every hash is md5-derived so the oracle
reproduces them bit-for-bit in SQL (see operators/dedup.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import load_table
from .operators import dedup as dd
from .operators import multimodal as mm
from .operators import similarity as sim
from .operators import text_analysis as ta

NORM_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

# shared oracle CTEs: normalized tokens and distinct word-3gram shingles
TOK_SQL = f"""
tok AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS t FROM documents
)"""
SHINGLE_SQL = """
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM tok, UNNEST(range(1, greatest(len(t) - 2, 0) + 1)) u(i)
  WHERE len(t) >= 3
)"""


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# dedup


def q_dedup_exact(spark, sf_dir):
    return dd.exact_dedup(_docs(spark, sf_dir), "doc_id", "text")


ORACLE_DEDUP_EXACT = f"""
SELECT md5({NORM_SQL}) AS digest, min(doc_id) AS keeper_id, count(*) AS group_size
FROM documents GROUP BY 1
"""


def q_dedup_jaccard(spark, sf_dir):
    # default df cap engaged — the oracle mirrors the same cap
    return dd.jaccard_pairs(
        _docs(spark, sf_dir), "doc_id", "text", n=3, threshold=0.5,
        max_shingle_df=dd.DEFAULT_MAX_SHINGLE_DF,
    )


ORACLE_DEDUP_JACCARD = f"""
WITH {TOK_SQL}, {SHINGLE_SQL},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
keep AS (SELECT shingle FROM sh GROUP BY shingle
         HAVING count(*) <= {dd.DEFAULT_MAX_SHINGLE_DF}),
shc AS (SELECT sh.* FROM sh JOIN keep USING (shingle)),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM shc a JOIN shc b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    sigs = dd.minhash_signatures(_docs(spark, sf_dir), "doc_id", "text", n=3, num_hashes=8)
    return dd.lsh_candidate_pairs(sigs, "doc_id", num_hashes=8, bands=4)


ORACLE_DEDUP_MINHASH = f"""
WITH {TOK_SQL}, {SHINGLE_SQL},
hx AS (SELECT doc_id, shingle, h FROM sh, UNNEST(range(0, 8)) u(h)),
mh AS (
  SELECT doc_id, h, min(md5(h || ':' || shingle)) AS minhash
  FROM hx GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, h // 2 AS band,
         md5(array_to_string(list_sort(list(minhash)), '|')) AS band_hash
  FROM mh GROUP BY 1, 2
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b USING (band, band_hash)
WHERE a.doc_id < b.doc_id
"""


def q_dedup_clusters(spark, sf_dir):
    """Duplicate-cluster consolidation: connected components over the
    MinHash-LSH candidate pairs → canonical keeper per cluster
    (connected_components; the step that turns pair lists into an
    actual deduped corpus)."""
    sigs = dd.minhash_signatures(_docs(spark, sf_dir), "doc_id", "text", n=3, num_hashes=8)
    pairs = dd.lsh_candidate_pairs(sigs, "doc_id", num_hashes=8, bands=4)
    return dd.connected_components(pairs)


ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {TOK_SQL}, {SHINGLE_SQL},
hx AS (SELECT doc_id, shingle, h FROM sh, UNNEST(range(0, 8)) u(h)),
mh AS (
  SELECT doc_id, h, min(md5(h || ':' || shingle)) AS minhash
  FROM hx GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, h // 2 AS band,
         md5(array_to_string(list_sort(list(minhash)), '|')) AS band_hash
  FROM mh GROUP BY 1, 2
),
p AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b, id_a FROM p
),
reach(id, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.lab < e.dst
),
labels AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id)
SELECT id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM labels
"""


def q_dedup_simhash(spark, sf_dir):
    s = dd.simhash(_docs(spark, sf_dir), "doc_id", "text", bits=32)
    return dd.simhash_near_pairs(s, "doc_id", max_hamming=3, bits=32)


def _simhash_oracle_sql() -> str:
    nbits = 32  # md5 has exactly 32 hex nibbles to project onto
    nib = "strpos('0123456789abcdef', substr(hv, {p}, 1)) - 1 - 7.5"
    sums = ",\n         ".join(
        f"sum({nib.format(p=p + 1)}) AS s{p}" for p in range(nbits)
    )
    bits = " + ".join(
        f"(CASE WHEN s{p} > 0 THEN {2**p} ELSE 0 END)" for p in range(nbits)
    )
    return f"""
WITH {TOK_SQL},
toks AS (
  SELECT DISTINCT doc_id, unnest(t) AS tok FROM tok
),
hv AS (SELECT doc_id, md5(tok) AS hv FROM toks),
agg AS (
  SELECT doc_id,
         {sums}
  FROM hv GROUP BY doc_id
),
sh AS (SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM agg)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sh a, sh b
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= 3
"""


ORACLE_DEDUP_SIMHASH = _simhash_oracle_sql()


# ---------------------------------------------------------------------------
# similarity search


def q_emb_cosine_topk(spark, sf_dir):
    e = _embs(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < 10)
    return sim.cosine_topk(e, queries, "vec_id", "embedding", k=5, dims=64)


ORACLE_EMB_COSINE_TOPK = """
WITH norms AS (
  SELECT vec_id, sqrt(sum(x * x)) AS nrm
  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
  GROUP BY vec_id
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum(q.embedding[d.d]::DOUBLE * c.embedding[d.d]::DOUBLE) AS dot
  FROM embeddings q, embeddings c, UNNEST(range(1, 65)) d(d)
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id,
         round(dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM pairs
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nc ON nc.vec_id = neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 5
"""


def q_emb_lsh_ann(spark, sf_dir):
    e = _embs(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < 10)
    return sim.lsh_ann_topk(e, queries, "vec_id", "embedding", k=5, n_bits=4, dims=64)


ORACLE_EMB_LSH_ANN = """
WITH w AS (
  SELECT b.b AS b, d.d AS d,
         strpos('0123456789abcdef',
                substr(md5('b:' || b.b || ':d:' || d.d), 1, 1)) - 1 - 7.5 AS wt
  FROM UNNEST(range(0, 4)) b(b), UNNEST(range(0, 64)) d(d)
),
proj AS (
  SELECT e.vec_id, w.b, sum(e.embedding[w.d + 1]::DOUBLE * w.wt) AS p
  FROM embeddings e, w
  GROUP BY 1, 2
),
buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN p > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY 1
),
norms AS (
  SELECT vec_id, sqrt(sum(x * x)) AS nrm
  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
  GROUP BY vec_id
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum(eq.embedding[d.d]::DOUBLE * ec.embedding[d.d]::DOUBLE) AS dot
  FROM buckets q
  JOIN buckets c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  JOIN embeddings eq ON eq.vec_id = q.vec_id
  JOIN embeddings ec ON ec.vec_id = c.vec_id
  , UNNEST(range(1, 65)) d(d)
  WHERE q.vec_id < 10
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id,
         round(dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM pairs
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nc ON nc.vec_id = neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 5
"""


def q_emb_ivf_ann(spark, sf_dir):
    """IVF ANN: nearest-centroid cells + nprobe probing (ivf_ann_topk).
    Deterministic centroids keep the whole index under the oracle."""
    e = _embs(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < 10)
    return sim.ivf_ann_topk(e, queries, "vec_id", "embedding", k=5, n_cells=8, nprobe=2)


ORACLE_EMB_IVF_ANN = """
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell, embedding AS cv
  FROM embeddings ORDER BY vec_id LIMIT 8
),
norms AS (
  SELECT vec_id, sqrt(sum(x * x)) AS nrm
  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
  GROUP BY vec_id
),
cnorms AS (
  SELECT cell, sqrt(sum(x * x)) AS nrm
  FROM (SELECT cell, unnest(cv)::DOUBLE AS x FROM cents)
  GROUP BY cell
),
scores AS (
  SELECT e.vec_id, c.cell,
         round(sum(e.embedding[d.d]::DOUBLE * c.cv[d.d]::DOUBLE)
               / (n.nrm * cn.nrm), 6) AS score
  FROM embeddings e
  JOIN norms n ON n.vec_id = e.vec_id, cents c
  JOIN cnorms cn ON cn.cell = c.cell, UNNEST(range(1, 65)) d(d)
  GROUP BY e.vec_id, c.cell, n.nrm, cn.nrm
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell ASC) AS rk
    FROM scores
  ) WHERE rk = 1
),
probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell ASC) AS rk
    FROM scores WHERE vec_id < 10
  ) WHERE rk <= 2
),
pairs AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         sum(eq.embedding[d.d]::DOUBLE * ec.embedding[d.d]::DOUBLE) AS dot
  FROM probes p
  JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
  JOIN embeddings eq ON eq.vec_id = p.query_id
  JOIN embeddings ec ON ec.vec_id = a.vec_id
  , UNNEST(range(1, 65)) d(d)
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM pairs
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nc ON nc.vec_id = neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 5
"""


# ---------------------------------------------------------------------------
# text analysis


def q_text_tokens(spark, sf_dir):
    return ta.token_counts(_docs(spark, sf_dir), "text").select(
        "doc_id", "ws_tokens", "bpe_tokens", "chars_div4_tokens"
    )


ORACLE_TEXT_TOKENS = f"""
WITH n AS (SELECT doc_id, {NORM_SQL} AS t FROM documents)
SELECT doc_id,
       CAST(len(string_split(t, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(t, '[a-z]+|[0-9]+|[^\\w\\s]')) AS BIGINT) AS bpe_tokens,
       CAST(ceil(length(t) / 4.0) AS BIGINT) AS chars_div4_tokens
FROM n
"""


def q_text_quality(spark, sf_dir):
    return ta.quality_features(_docs(spark, sf_dir), "text").select(
        "doc_id", "q_chars", "q_words", "punct_ratio", "stop_ratio",
        "mean_word_len", "quality_score",
    )


ORACLE_TEXT_QUALITY = f"""
WITH n AS (SELECT doc_id, {NORM_SQL} AS t FROM documents),
f AS (
  SELECT doc_id,
         length(t) AS n_chars,
         len(string_split(t, ' ')) AS n_words,
         len(regexp_extract_all(t, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(t, '\\b(the|and|of|is|a|to|in)\\b')) AS n_stop
  FROM n
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS q_chars,
       CAST(n_words AS BIGINT) AS q_words,
       floor(n_punct / greatest(n_chars, 1) * 1e6 + 0.5) / 1e6 AS punct_ratio,
       floor(n_stop / greatest(n_words, 1) * 1e6 + 0.5) / 1e6 AS stop_ratio,
       floor((n_chars - (n_words - 1)) / greatest(n_words, 1) * 1e6 + 0.5) / 1e6 AS mean_word_len,
       floor(least(1.0, greatest(0.0,
           0.5 + 2.0 * (n_stop / greatest(n_words, 1))
               - 3.0 * (n_punct / greatest(n_chars, 1))
               - abs((n_chars - (n_words - 1)) / greatest(n_words, 1) - 5.0) / 10.0)) * 1e6 + 0.5) / 1e6
       AS quality_score
FROM f
"""


def q_text_lang_id(spark, sf_dir):
    return ta.lang_scores(_docs(spark, sf_dir), "text").select(
        "doc_id", "lang", "score_en", "score_de", "score_fr", "score_es", "pred_lang"
    )


def _lang_oracle_sql() -> str:
    from .operators.text_analysis import LANG_MARKERS

    score_exprs = []
    for lang, words in LANG_MARKERS.items():
        parts = " + ".join(
            f"len(regexp_extract_all(t, '\\b{w}\\b'))" for w in words
        )
        score_exprs.append(f"CAST({parts} AS BIGINT) AS score_{lang}")
    scores = ",\n       ".join(score_exprs)
    langs = list(LANG_MARKERS)
    best = f"greatest({', '.join('score_' + l for l in langs)})"
    case = " ".join(
        f"WHEN score_{l} = {best} THEN '{l}'" for l in langs
    )
    return f"""
WITH n AS (SELECT doc_id, lang, {NORM_SQL} AS t FROM documents),
s AS (
  SELECT doc_id, lang,
       {scores}
  FROM n
)
SELECT doc_id, lang, score_en, score_de, score_fr, score_es,
       CASE WHEN {best} = 0 THEN 'und' {case} ELSE 'und' END AS pred_lang
FROM s
"""


ORACLE_TEXT_LANG_ID = _lang_oracle_sql()


def q_text_fingerprint(spark, sf_dir):
    return ta.fingerprint(_docs(spark, sf_dir), "text").select(
        "doc_id", "fingerprint", "fp_bucket"
    )


ORACLE_TEXT_FINGERPRINT = f"""
WITH n AS (SELECT doc_id, md5({NORM_SQL}) AS d FROM documents)
SELECT doc_id, d AS fingerprint,
       CAST((strpos('0123456789abcdef', substr(d, 1, 1)) - 1) * 4096
          + (strpos('0123456789abcdef', substr(d, 2, 1)) - 1) * 256
          + (strpos('0123456789abcdef', substr(d, 3, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(d, 4, 1)) - 1) AS BIGINT) AS fp_bucket
FROM n
"""


# ---------------------------------------------------------------------------
# multimodal plumbing (fake decode is deterministic arithmetic → oracle)


def q_multimodal_features(spark, sf_dir):
    media = mm.documents_as_media(_docs(spark, sf_dir))
    return mm.extract_features(media)


ORACLE_MULTIMODAL_FEATURES = """
SELECT doc_id AS media_id,
       CAST(strlen(text) % 640 + 32 AS BIGINT) AS width,
       CAST((strlen(text) // 640) % 480 + 32 AS BIGINT) AS height,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       round((ascii(substr(text, 1, 1)) + ascii(substr(text, length(text), 1))) / 510.0, 6)
         AS brightness
FROM documents
"""


def q_multimodal_resize(spark, sf_dir):
    """Fit-in-box resize geometry over the media adapter (resize_media);
    fake-decode dims feed real aspect-ratio arithmetic."""
    media = mm.documents_as_media(_docs(spark, sf_dir))
    return mm.resize_media(media, target_w=224, target_h=224)


ORACLE_MULTIMODAL_RESIZE = """
WITH dims AS (
  SELECT doc_id AS media_id,
         strlen(text) AS n,
         strlen(text) % 640 + 32 AS w,
         (strlen(text) // 640) % 480 + 32 AS h
  FROM documents
),
scaled AS (
  SELECT media_id, n, w, h,
         least(224.0 / w, 224.0 / h, 1.0) AS scale
  FROM dims
)
SELECT media_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(greatest(CAST(trunc(w * scale) AS BIGINT), 1) AS BIGINT) AS out_width,
       CAST(greatest(CAST(trunc(h * scale) AS BIGINT), 1) AS BIGINT) AS out_height,
       CAST(trunc(n * scale * scale) AS BIGINT) AS out_bytes
FROM scaled
"""


def q_multimodal_frame_sample(spark, sf_dir):
    media = mm.documents_as_media(_docs(spark, sf_dir))
    return mm.frame_sample_plan(media, every_n_bytes=100)


ORACLE_MULTIMODAL_FRAME_SAMPLE = """
SELECT doc_id AS media_id, CAST(u.off AS BIGINT) AS frame_offset
FROM documents, UNNEST(range(0, greatest(strlen(text) - 1, 0) + 1, 100)) u(off)
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_clusters": q_dedup_clusters,
    "dedup_simhash": q_dedup_simhash,
    "emb_cosine_topk": q_emb_cosine_topk,
    "emb_lsh_ann": q_emb_lsh_ann,
    "emb_ivf_ann": q_emb_ivf_ann,
    "text_tokens": q_text_tokens,
    "text_quality": q_text_quality,
    "text_lang_id": q_text_lang_id,
    "text_fingerprint": q_text_fingerprint,
    "multimodal_features": q_multimodal_features,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_resize": q_multimodal_resize,
}

ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_jaccard": ORACLE_DEDUP_JACCARD,
    "dedup_minhash_lsh": ORACLE_DEDUP_MINHASH,
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "dedup_simhash": ORACLE_DEDUP_SIMHASH,
    "emb_cosine_topk": ORACLE_EMB_COSINE_TOPK,
    "emb_lsh_ann": ORACLE_EMB_LSH_ANN,
    "emb_ivf_ann": ORACLE_EMB_IVF_ANN,
    "text_tokens": ORACLE_TEXT_TOKENS,
    "text_quality": ORACLE_TEXT_QUALITY,
    "text_lang_id": ORACLE_TEXT_LANG_ID,
    "text_fingerprint": ORACLE_TEXT_FINGERPRINT,
    "multimodal_features": ORACLE_MULTIMODAL_FEATURES,
    "multimodal_frame_sample": ORACLE_MULTIMODAL_FRAME_SAMPLE,
    "multimodal_resize": ORACLE_MULTIMODAL_RESIZE,
}


def q_emb_near_dup(spark, sf_dir):
    # this corpus has no planted geometric duplicates; 0.4 sits at the
    # top tail of the cosine distribution so the operator exercises a
    # non-trivial result set while staying selective. LSH-blocked (3
    # bucket rotations) — the oracle reproduces the buckets in SQL.
    return sim.cosine_near_dup_pairs(
        _embs(spark, sf_dir), threshold=0.4, n_bits=4, dims=64, rotations=3
    )


# Candidate pairs share an LSH bucket in any of 3 rotated hyperplane
# sets (salted md5 weights, identical to similarity.hyperplane_weight);
# exact cosine inside candidates.
ORACLE_EMB_NEAR_DUP = """
WITH w AS (
  SELECT r.r AS r, b.b AS b, d.d AS d,
         strpos('0123456789abcdef',
                substr(md5('r' || r.r || ':b:' || b.b || ':d:' || d.d), 1, 1)) - 1 - 7.5 AS wt
  FROM UNNEST(range(0, 3)) r(r), UNNEST(range(0, 4)) b(b), UNNEST(range(0, 64)) d(d)
),
proj AS (
  SELECT e.vec_id, w.r, w.b, sum(e.embedding[w.d + 1]::DOUBLE * w.wt) AS p
  FROM embeddings e, w
  GROUP BY 1, 2, 3
),
buckets AS (
  SELECT vec_id, r,
         CAST(sum(CASE WHEN p > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b ON a.r = b.r AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
),
norms AS (
  SELECT vec_id, sqrt(sum(x * x)) AS nrm
  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
  GROUP BY vec_id
),
pairs AS (
  SELECT c.id_a, c.id_b,
         sum(ea.embedding[d.d]::DOUBLE * eb.embedding[d.d]::DOUBLE) AS dot
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
  , UNNEST(range(1, 65)) d(d)
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM pairs
JOIN norms na ON na.vec_id = id_a
JOIN norms nb ON nb.vec_id = id_b
WHERE dot / (na.nrm * nb.nrm) >= 0.4
"""

QUERIES["emb_near_dup"] = q_emb_near_dup
ORACLES["emb_near_dup"] = ORACLE_EMB_NEAR_DUP


def q_curation_pipeline(spark, sf_dir):
    """Composite curation pipeline: quality+token features (codegen) →
    lang/quality filter → exact dedup keeping min doc_id per digest
    (one min_by shuffle) → per-source yield (one partial+final agg).
    operators/curation.py."""
    from .operators.curation import curate_corpus

    return curate_corpus(_docs(spark, sf_dir), langs=("en",), min_quality=0.45)


ORACLE_CURATION_PIPELINE = f"""
WITH f AS (
  SELECT doc_id, source, lang, {NORM_SQL} AS t FROM documents
),
feat AS (
  SELECT doc_id, source, lang, t,
         length(t) AS n_chars,
         len(string_split(t, ' ')) AS n_words,
         len(regexp_extract_all(t, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(t, '\\b(the|and|of|is|a|to|in)\\b')) AS n_stop,
         CAST(len(regexp_extract_all(t, '[a-z]+|[0-9]+|[^\\w\\s]')) AS BIGINT)
           AS bpe_tokens
  FROM f
),
scored AS (
  SELECT doc_id, source, t, bpe_tokens,
         floor(least(1.0, greatest(0.0,
             0.5 + 2.0 * (n_stop / greatest(n_words, 1))
                 - 3.0 * (n_punct / greatest(n_chars, 1))
                 - abs((n_chars - (n_words - 1)) / greatest(n_words, 1) - 5.0) / 10.0))
           * 1e6 + 0.5) / 1e6 AS quality_score
  FROM feat
  WHERE lang = 'en'
),
kept AS (
  SELECT * FROM scored WHERE quality_score >= 0.45
),
survivors AS (
  SELECT source, bpe_tokens, quality_score,
         row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) AS rn
  FROM kept
)
SELECT source,
       count(*) AS kept_docs,
       CAST(sum(bpe_tokens) AS BIGINT) AS sum_bpe_tokens,
       floor((sum(CAST(round(quality_score * 1e6, 0) AS BIGINT)) / count(*) / 1e6) * 1e6 + 0.5) / 1e6 AS avg_quality
FROM survivors WHERE rn = 1
GROUP BY source ORDER BY source
"""

QUERIES["curation_pipeline"] = q_curation_pipeline
ORACLES["curation_pipeline"] = ORACLE_CURATION_PIPELINE


# ---------------------------------------------------------------------------
# corpus-level curation: repetition, TF-IDF, decontamination, sampling


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition signals (repetition_features): zero-shuffle
    array_sort + run-length fold per row."""
    return ta.repetition_features(_docs(spark, sf_dir), "text").select(
        "doc_id", "n_bigrams", "n_distinct_bigrams", "dup_bigram_frac",
        "top_bigram_frac", "dup_token_frac",
    )


ORACLE_TEXT_REPETITION = f"""
WITH {TOK_SQL},
bi AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS bg
  FROM tok, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) u(i)
  WHERE len(t) >= 2
),
bc AS (SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS nd, CAST(max(c) AS BIGINT) AS best
  FROM bc GROUP BY 1
),
tk AS (
  SELECT doc_id, len(t) AS n_tok, len(list_distinct(t)) AS nd_tok FROM tok
)
SELECT d.doc_id,
       coalesce(a.total, 0) AS n_bigrams,
       coalesce(a.nd, 0) AS n_distinct_bigrams,
       CASE WHEN coalesce(a.total, 0) > 0
            THEN floor((a.total - a.nd) / a.total * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS dup_bigram_frac,
       CASE WHEN coalesce(a.total, 0) > 0
            THEN floor(a.best / a.total * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS top_bigram_frac,
       floor((tk.n_tok - tk.nd_tok) / greatest(tk.n_tok, 1) * 1e6 + 0.5) / 1e6
         AS dup_token_frac
FROM documents d
LEFT JOIN agg a ON a.doc_id = d.doc_id
JOIN tk ON tk.doc_id = d.doc_id
"""


def q_tfidf_top_terms(spark, sf_dir):
    """Corpus TF-IDF top-3 terms per doc (corpus.tfidf_top_terms):
    rarity-weighted tf with an integer-exact score (no ln — cross-engine
    libm drift; docstring in operators/corpus.py)."""
    from .operators.corpus import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), "doc_id", "text", k=3)


ORACLE_TFIDF = f"""
WITH {TOK_SQL},
toks AS (SELECT doc_id, unnest(t) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS term_df FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, term_df, (tf * n_docs) / term_df AS score
  FROM tf JOIN dfq USING (term), nd
),
ranked AS (
  SELECT doc_id, term, tf, term_df, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(term_df AS BIGINT) AS term_df,
       floor(score * 1e6 + 0.5) / 1e6 AS tfidf, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 3
"""


DECONTAM_THRESHOLD = 0.05


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (corpus.decontaminate): src0 plays the
    held-out eval suite; corpus docs are scored by 3-gram shingle
    overlap against its broadcast shingle set."""
    from .operators.corpus import decontaminate

    return decontaminate(
        _docs(spark, sf_dir), "doc_id", "text",
        benchmark_filter=F.col("source") == "src0",
        n=3, threshold=DECONTAM_THRESHOLD,
    )


ORACLE_DECONTAMINATE = f"""
WITH {TOK_SQL}, {SHINGLE_SQL},
bsh AS (
  SELECT DISTINCT shingle FROM sh
  JOIN documents d ON d.doc_id = sh.doc_id WHERE d.source = 'src0'
),
csh AS (
  SELECT sh.doc_id, sh.shingle FROM sh
  JOIN documents d ON d.doc_id = sh.doc_id WHERE d.source <> 'src0'
),
sizes AS (SELECT doc_id, count(*) AS n FROM csh GROUP BY 1),
ov AS (
  SELECT c.doc_id, count(*) AS n_common
  FROM csh c JOIN bsh USING (shingle) GROUP BY 1
)
SELECT d.doc_id, d.source,
       CAST(coalesce(s.n, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(o.n_common, 0) AS BIGINT) AS n_common,
       CASE WHEN coalesce(s.n, 0) > 0
            THEN floor(coalesce(o.n_common, 0) / s.n * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS overlap_frac,
       CAST(CASE WHEN coalesce(s.n, 0) > 0
            THEN coalesce(o.n_common, 0) / s.n >= {DECONTAM_THRESHOLD}
            ELSE FALSE END AS INTEGER) AS contaminated
FROM documents d
LEFT JOIN sizes s ON s.doc_id = d.doc_id
LEFT JOIN ov o ON o.doc_id = d.doc_id
WHERE d.source <> 'src0'
"""


# per-stratum sampling rates shared by the Spark query and the oracle;
# spread over the 20 synthetic sources with three distinct tiers
SAMPLE_RATES = {
    f"src{i}": (0.6 if i % 3 == 0 else 0.35 if i % 3 == 1 else 0.15)
    for i in range(20)
}


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-source sampling (corpus.stratified_sample):
    md5-keyed integer thresholds, zero shuffles."""
    from .operators.corpus import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir), "doc_id", "source", rates=SAMPLE_RATES, salt="s1"
    )


def _stratified_oracle_sql() -> str:
    from .operators.corpus import sample_thresholds

    nib = "(strpos('0123456789abcdef', substr(m, {p}, 1)) - 1)"
    key = " + ".join(
        f"{nib.format(p=p)} * {16 ** (8 - p)}" for p in range(1, 9)
    )
    case = " ".join(
        f"WHEN source = '{s}' THEN {t}"
        for s, t in sorted(sample_thresholds(SAMPLE_RATES).items())
    )
    return f"""
WITH keyed AS (
  SELECT doc_id, source, md5('s1:' || doc_id) AS m FROM documents
),
k AS (SELECT doc_id, source, CAST({key} AS BIGINT) AS sample_key FROM keyed)
SELECT doc_id, source, sample_key FROM k
WHERE sample_key < (CASE {case} ELSE 0 END)
"""


ORACLE_STRATIFIED_SAMPLE = _stratified_oracle_sql()

def q_curation_full(spark, sf_dir):
    """Flagship end-to-end curation (curation.curate_corpus_full):
    quality+repetition filter → benchmark decontamination → MinHash-LSH
    near-dup clusters → per-source yield. src0 is the held-out
    benchmark."""
    from .operators.curation import curate_corpus_full

    return curate_corpus_full(
        _docs(spark, sf_dir),
        benchmark_filter=F.col("source") == "src0",
        langs=("en",), min_quality=0.45,
        max_dup_bigram_frac=0.05, decontam_threshold=0.05,
        n=3, num_hashes=8, bands=4,
    )


ORACLE_CURATION_FULL = f"""
WITH RECURSIVE {TOK_SQL},
bi AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS bg
  FROM tok, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) u(i)
  WHERE len(t) >= 2
),
bc AS (SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY 1, 2),
ragg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS nd
  FROM bc GROUP BY 1
),
rep AS (
  SELECT doc_id,
         CASE WHEN total > 0 THEN floor((total - nd) / total * 1e6 + 0.5) / 1e6
              ELSE 0.0 END AS dup_bigram_frac
  FROM ragg
),
feat AS (
  SELECT d.doc_id, d.source, d.lang, n.t,
         length(n.t) AS n_chars,
         len(string_split(n.t, ' ')) AS n_words,
         len(regexp_extract_all(n.t, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(n.t, '\\b(the|and|of|is|a|to|in)\\b')) AS n_stop,
         CAST(len(regexp_extract_all(n.t, '[a-z]+|[0-9]+|[^\\w\\s]')) AS BIGINT)
           AS bpe_tokens
  FROM documents d JOIN (SELECT doc_id, {NORM_SQL} AS t FROM documents) n
    ON n.doc_id = d.doc_id
),
scored AS (
  SELECT doc_id, source, lang, t, bpe_tokens,
         floor(least(1.0, greatest(0.0,
             0.5 + 2.0 * (n_stop / greatest(n_words, 1))
                 - 3.0 * (n_punct / greatest(n_chars, 1))
                 - abs((n_chars - (n_words - 1)) / greatest(n_words, 1) - 5.0) / 10.0))
           * 1e6 + 0.5) / 1e6 AS quality_score
  FROM feat
),
kept AS (
  SELECT s.doc_id, s.source, s.bpe_tokens, s.quality_score
  FROM scored s LEFT JOIN rep r ON r.doc_id = s.doc_id
  WHERE s.source <> 'src0' AND s.lang = 'en' AND s.quality_score >= 0.45
    AND coalesce(r.dup_bigram_frac, 0.0) <= 0.05
),
{SHINGLE_SQL},
bsh AS (
  SELECT DISTINCT shingle FROM sh
  JOIN documents d ON d.doc_id = sh.doc_id WHERE d.source = 'src0'
),
ksh AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN kept k ON k.doc_id = sh.doc_id),
cont AS (
  SELECT ksh.doc_id
  FROM ksh LEFT JOIN (SELECT shingle, 1 AS hit FROM bsh) b USING (shingle)
  GROUP BY ksh.doc_id
  HAVING count(b.hit) / count(*) >= 0.05
),
clean AS (
  SELECT k.* FROM kept k WHERE k.doc_id NOT IN (SELECT doc_id FROM cont)
),
csh AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN clean c ON c.doc_id = sh.doc_id),
hx AS (SELECT doc_id, shingle, h FROM csh, UNNEST(range(0, 8)) u(h)),
mh AS (
  SELECT doc_id, h, min(md5(h || ':' || shingle)) AS minhash
  FROM hx GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, h // 2 AS band,
         md5(array_to_string(list_sort(list(minhash)), '|')) AS band_hash
  FROM mh GROUP BY 1, 2
),
p AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b, id_a FROM p
),
reach(id, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.lab < e.dst
),
labels AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id),
dropped AS (SELECT id FROM labels WHERE id <> cluster_id),
final AS (
  SELECT * FROM clean WHERE doc_id NOT IN (SELECT id FROM dropped)
)
SELECT source, count(*) AS kept_docs, CAST(sum(bpe_tokens) AS BIGINT) AS sum_bpe_tokens,
       floor((sum(CAST(round(quality_score * 1e6, 0) AS BIGINT)) / count(*) / 1e6) * 1e6 + 0.5) / 1e6 AS avg_quality
FROM final GROUP BY source ORDER BY source
"""

QUERIES["curation_full"] = q_curation_full
ORACLES["curation_full"] = ORACLE_CURATION_FULL

QUERIES["text_repetition"] = q_text_repetition
ORACLES["text_repetition"] = ORACLE_TEXT_REPETITION
QUERIES["tfidf_top_terms"] = q_tfidf_top_terms
ORACLES["tfidf_top_terms"] = ORACLE_TFIDF
QUERIES["decontaminate"] = q_decontaminate
ORACLES["decontaminate"] = ORACLE_DECONTAMINATE
QUERIES["stratified_sample"] = q_stratified_sample
ORACLES["stratified_sample"] = ORACLE_STRATIFIED_SAMPLE


def q_pii_redact(spark, sf_dir):
    """PII redaction (redaction.redact_pii): per-pattern counts + global
    sequential redaction. The synthetic corpus has no PII, so the gate
    plants deterministic emails/IPs/phones/SSNs derived from doc_id (the
    SAME construction in the oracle) and verifies counts and the
    redacted string bit-for-bit."""
    from .operators.redaction import redact_pii

    d = _docs(spark, sf_dir)
    s = lambda c: c.cast("string")
    enriched = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" reach user"), s(F.col("doc_id")), F.lit("@mail.example.org")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" host 192.168."), s(F.col("doc_id") % 200),
                    F.lit("."), s(F.col("doc_id") % 250),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" call 415-555-"), F.lpad(s(F.col("doc_id") % 10000), 4, "0")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" id 123-45-6789")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(enriched, "text")


def _pii_oracle_sql() -> str:
    from .operators.redaction import PII_PATTERNS

    counts = ",\n  ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, (pat, _) in PII_PATTERNS.items()
    )
    total = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for pat, _ in PII_PATTERNS.values()
    )
    redacted = "text"
    for pat, repl in PII_PATTERNS.values():
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    return f"""
WITH enriched AS (
  SELECT doc_id, text ||
    CASE WHEN doc_id % 3 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.org' ELSE '' END ||
    CASE WHEN doc_id % 5 = 0 THEN ' host 192.168.' || CAST(doc_id % 200 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END ||
    CASE WHEN doc_id % 7 = 0 THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
    CASE WHEN doc_id % 11 = 0 THEN ' id 123-45-6789' ELSE '' END AS text
  FROM documents
)
SELECT doc_id, text,
  {counts},
  CAST({total} AS BIGINT) AS pii_total,
  {redacted} AS text_redacted
FROM enriched
"""


ORACLE_PII_REDACT = _pii_oracle_sql()


def q_segment_dedup(spark, sf_dir):
    """C4-style segment-level dedup (corpus.segment_dedup): 8-word
    segments, corpus-duplicated segments keep only their first
    (doc, pos) occurrence; docs are reassembled from survivors."""
    from .operators.corpus import segment_dedup

    return segment_dedup(_docs(spark, sf_dir), "doc_id", "text", seg_words=8)


ORACLE_SEGMENT_DEDUP = f"""
WITH {TOK_SQL},
segs AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(t[(i-1)*8+1:i*8], ' ') AS seg
  FROM tok, UNNEST(range(1, CAST(ceil(len(t) / 8.0) AS BIGINT) + 1)) u(i)
  WHERE len(t) >= 1
),
flagged AS (
  SELECT doc_id, pos, seg,
         (count(*) OVER (PARTITION BY seg) = 1
          OR row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) = 1) AS keep
  FROM segs
)
SELECT doc_id,
  coalesce(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY pos), '') AS clean_text,
  CAST(count(*) AS BIGINT) AS n_segments,
  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM flagged GROUP BY doc_id
"""

QUERIES["pii_redact"] = q_pii_redact
ORACLES["pii_redact"] = ORACLE_PII_REDACT
QUERIES["segment_dedup"] = q_segment_dedup
ORACLES["segment_dedup"] = ORACLE_SEGMENT_DEDUP


def q_emb_kmeans(spark, sf_dir):
    """Deterministic spherical k-means, k=4, 2 Lloyd iterations
    (similarity.kmeans_iterations); the oracle replays the identical
    trajectory with unrolled CTEs."""
    return sim.kmeans_iterations(
        _embs(spark, sf_dir), "vec_id", "embedding", k=4, iterations=2
    )


def _kmeans_oracle_sql(k: int = 4, iterations: int = 2, dims: int = 64) -> str:
    rng = f"UNNEST(range(1, {dims + 1})) AS d(d)"
    score = (
        "round(sum(e.embedding[d.d]::DOUBLE * c.cv[d.d]::DOUBLE)"
        " / (sqrt(sum(e.embedding[d.d]::DOUBLE * e.embedding[d.d]::DOUBLE))"
        " * sqrt(sum(c.cv[d.d]::DOUBLE * c.cv[d.d]::DOUBLE))), 6)"
    )
    parts = [
        f"""cents0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell, embedding AS cv
  FROM embeddings ORDER BY vec_id LIMIT {k}
)"""
    ]
    for i in range(iterations):
        parts.append(f"""s{i} AS (
  SELECT e.vec_id, c.cell, {score} AS s
  FROM embeddings e, cents{i} c, {rng}
  GROUP BY e.vec_id, c.cell
)""")
        parts.append(f"""a{i} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
    FROM s{i}) WHERE rn = 1
)""")
        parts.append(f"""cents{i + 1} AS (
  SELECT cell, list(m ORDER BY d) AS cv FROM (
    SELECT a.cell, d.d AS d, round(avg(e.embedding[d.d]::DOUBLE), 6) AS m
    FROM a{i} a JOIN embeddings e USING (vec_id), {rng}
    GROUP BY a.cell, d.d
  ) GROUP BY cell
)""")
    n = iterations
    parts.append(f"""sf AS (
  SELECT e.vec_id, c.cell, {score} AS s
  FROM embeddings e, cents{n} c, {rng}
  GROUP BY e.vec_id, c.cell
)""")
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT vec_id, CAST(cell AS BIGINT) AS cell, s AS score FROM (
  SELECT vec_id, cell, s,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
  FROM sf) WHERE rn = 1
"""
    )


ORACLE_EMB_KMEANS = _kmeans_oracle_sql()

QUERIES["emb_kmeans"] = q_emb_kmeans
ORACLES["emb_kmeans"] = ORACLE_EMB_KMEANS


def q_emb_mean_pool(spark, sf_dir):
    """Chunk→document mean pooling (similarity.mean_pool_embeddings):
    label plays the document key; pooled vector surfaces element-wise
    for the hash compare."""
    pooled = sim.mean_pool_embeddings(_embs(spark, sf_dir), "label", "embedding")
    return pooled.select(
        "label", F.posexplode("pooled").alias("d", "m"), "n_vectors"
    ).select("label", "d", "m", "n_vectors")


ORACLE_EMB_MEAN_POOL = """
WITH per_dim AS (
  SELECT label, d.d - 1 AS d, round(avg(embedding[d.d]::DOUBLE), 6) AS m,
         CAST(count(*) AS BIGINT) AS n
  FROM embeddings, UNNEST(range(1, 65)) AS d(d)
  GROUP BY label, d.d
)
SELECT label, CAST(d AS INT) AS d, m, n AS n_vectors FROM per_dim
"""

QUERIES["emb_mean_pool"] = q_emb_mean_pool
ORACLES["emb_mean_pool"] = ORACLE_EMB_MEAN_POOL


def q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test split (corpus.dataset_split):
    md5-keyed integer thresholds, 90/5/5; membership is stable under
    corpus growth, unlike random splits."""
    from .operators.corpus import dataset_split

    return dataset_split(_docs(spark, sf_dir), "doc_id")


def _split_oracle_sql() -> str:
    space = 16 ** 8
    c1 = int(0.9 * space)
    c2 = int(0.95 * space)
    nib = "(strpos('0123456789abcdef', substr(m, {p}, 1)) - 1)"
    key = " + ".join(f"{nib.format(p=p)} * {16 ** (8 - p)}" for p in range(1, 9))
    return f"""
WITH keyed AS (
  SELECT doc_id, md5('split:' || doc_id) AS m FROM documents
), k AS (SELECT doc_id, CAST({key} AS BIGINT) AS split_key FROM keyed)
SELECT doc_id, split_key,
       CASE WHEN split_key < {c1} THEN 'train'
            WHEN split_key < {c2} THEN 'val'
            ELSE 'test' END AS split
FROM k
"""


ORACLE_DATASET_SPLIT = _split_oracle_sql()


def q_pack_sequences(spark, sf_dir):
    """Contiguous 2048-token sequence packing (corpus.pack_sequences)
    over BPE-ish token counts; bin/offset from one global cumsum."""
    from .operators.corpus import pack_sequences
    from .operators.text_analysis import token_counts

    toks = token_counts(_docs(spark, sf_dir), "text").select("doc_id", "bpe_tokens")
    return pack_sequences(toks, "doc_id", "bpe_tokens", budget=2048)


ORACLE_PACK_SEQUENCES = f"""
WITH RECURSIVE {TOK_SQL},
toks AS (
  SELECT d.doc_id,
         CAST(len(regexp_extract_all(n.t, '[a-z]+|[0-9]+|[^\\w\\s]')) AS BIGINT) AS tokens
  FROM documents d JOIN (SELECT doc_id, {NORM_SQL} AS t FROM documents) n
    ON n.doc_id = d.doc_id
),
c AS (
  SELECT doc_id, tokens,
         sum(tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tokens AS start
  FROM toks
)
SELECT doc_id, tokens, CAST(floor(start / 2048) AS BIGINT) AS bin,
       CAST(start % 2048 AS BIGINT) AS bin_offset
FROM c
"""

QUERIES["dataset_split"] = q_dataset_split
ORACLES["dataset_split"] = ORACLE_DATASET_SPLIT
QUERIES["pack_sequences"] = q_pack_sequences
ORACLES["pack_sequences"] = ORACLE_PACK_SEQUENCES


def q_dedup_incremental(spark, sf_dir):
    """Incremental batch-vs-corpus dedup (dedup.incremental_dedup):
    src0 plays the existing corpus, every other source is the new
    batch; verdicts are corpus-dup / in-batch-dup / new."""
    d = _docs(spark, sf_dir)
    return dd.incremental_dedup(
        d.filter(F.col("source") != "src0"),
        d.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
    )


ORACLE_DEDUP_INCREMENTAL = f"""
WITH corpus AS (
  SELECT DISTINCT md5({NORM_SQL}) AS digest FROM documents WHERE source = 'src0'
),
batch AS (
  SELECT doc_id, md5({NORM_SQL}) AS digest FROM documents WHERE source <> 'src0'
),
rk AS (
  SELECT doc_id, digest,
         row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn,
         digest IN (SELECT digest FROM corpus) AS inc
  FROM batch
)
SELECT doc_id, digest,
       CASE WHEN inc THEN 'dup_of_corpus'
            WHEN rn > 1 THEN 'dup_in_batch'
            ELSE 'new' END AS verdict
FROM rk
"""

QUERIES["dedup_incremental"] = q_dedup_incremental
ORACLES["dedup_incremental"] = ORACLE_DEDUP_INCREMENTAL


def q_emb_quantize(spark, sf_dir):
    """Per-vector int8 scalar quantization (similarity.
    quantize_embeddings): dequant params + integer code checksum +
    mean absolute reconstruction error, map-only."""
    return sim.quantize_embeddings(_embs(spark, sf_dir))


ORACLE_EMB_QUANTIZE = """
WITH x AS (
  SELECT vec_id, d.d AS dim, embedding[d.d]::DOUBLE AS v
  FROM embeddings, UNNEST(range(1, 65)) d(d)
),
mm AS (SELECT vec_id, min(v) AS vmin, max(v) AS vmax FROM x GROUP BY 1),
q AS (
  SELECT x.vec_id, x.v, mm.vmin, mm.vmax,
         CASE WHEN mm.vmax > mm.vmin
              THEN CAST(floor((x.v - mm.vmin) / ((mm.vmax - mm.vmin) / 255) + 0.5) AS BIGINT)
              ELSE 0 END AS code
  FROM x JOIN mm USING (vec_id)
)
SELECT vec_id,
       round(min(vmin), 6) AS q_min,
       round(max(vmax), 6) AS q_max,
       CAST(sum(code) AS BIGINT) AS checksum,
       round(sum(abs(v - (code * ((vmax - vmin) / 255) + vmin))) / 64, 6) AS mean_abs_err
FROM q GROUP BY 1
"""

QUERIES["emb_quantize"] = q_emb_quantize
ORACLES["emb_quantize"] = ORACLE_EMB_QUANTIZE


def q_text_familiarity(spark, sf_dir):
    """Corpus-trained word-bigram familiarity score
    (corpus.bigram_familiarity) — the no-ln perplexity-filter analog."""
    from .operators.corpus import bigram_familiarity

    return bigram_familiarity(_docs(spark, sf_dir))


ORACLE_TEXT_FAMILIARITY = f"""
WITH {TOK_SQL},
bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM tok, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) u(i)
  WHERE len(t) >= 2
),
cnt AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
den AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
p AS (
  SELECT w1, w2,
         floor((c2::DOUBLE / c1) * 1000000.0 + 0.5) / 1000000.0 AS p
  FROM cnt JOIN den USING (w1)
),
scored AS (
  SELECT bg.doc_id, count(*) AS n_bg,
         sum(CAST(round(p.p * 1000000.0, 0) AS BIGINT)) AS micro
  FROM bg JOIN p USING (w1, w2) GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bg, 0) AS BIGINT) AS n_bigrams,
       coalesce(
         floor(((s.micro::DOUBLE / s.n_bg) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0,
         0.0
       ) AS familiarity
FROM documents d LEFT JOIN scored s USING (doc_id)
"""

QUERIES["text_familiarity"] = q_text_familiarity
ORACLES["text_familiarity"] = ORACLE_TEXT_FAMILIARITY


def q_emb_knn_classify(spark, sf_dir):
    """k-NN majority-vote label prediction (similarity.knn_classify):
    queries are vec_id < 10, classified from their 5 nearest neighbors'
    labels with smaller-label tie-break."""
    e = _embs(spark, sf_dir)
    return sim.knn_classify(
        e, e.filter(F.col("vec_id") < 10), "vec_id", "embedding", "label",
        k=5, dims=64,
    )


ORACLE_EMB_KNN = """
WITH norms AS (
  SELECT vec_id, sqrt(sum(x * x)) AS nrm
  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
  GROUP BY vec_id
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum(q.embedding[d.d]::DOUBLE * c.embedding[d.d]::DOUBLE) AS dot
  FROM embeddings q, embeddings c, UNNEST(range(1, 65)) d(d)
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id,
         round(dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM pairs
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nc ON nc.vec_id = neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
),
votes AS (
  SELECT r.query_id, e.label AS nl, count(*) AS votes
  FROM ranked r JOIN embeddings e ON e.vec_id = r.neighbor_id
  WHERE r.rk <= 5
  GROUP BY 1, 2
),
winner AS (
  SELECT query_id, nl, votes,
         row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, nl ASC) AS rk2,
         sum(votes) OVER (PARTITION BY query_id) AS total
  FROM votes
)
SELECT query_id, nl AS predicted_label,
       CAST(votes AS BIGINT) AS votes, CAST(total AS BIGINT) AS total
FROM winner WHERE rk2 = 1
"""

QUERIES["emb_knn_classify"] = q_emb_knn_classify
ORACLES["emb_knn_classify"] = ORACLE_EMB_KNN


def q_dedup_verify(spark, sf_dir):
    """Candidate→verify near-dup pipeline (dedup.verify_candidate_pairs):
    MinHash-LSH candidates re-scored with EXACT set Jaccard before any
    drop decision — banding false positives die here."""
    d = _docs(spark, sf_dir)
    sigs = dd.minhash_signatures(d, "doc_id", "text", n=3, num_hashes=8)
    pairs = dd.lsh_candidate_pairs(sigs, "doc_id", num_hashes=8, bands=4)
    sh = dd.word_shingles(d, "doc_id", "text", 3).select(
        F.col("doc_id"), F.xxhash64("shingle").alias("shingle")
    )
    return dd.verify_candidate_pairs(pairs, sh, "doc_id", threshold=0.5)


ORACLE_DEDUP_VERIFY = f"""
WITH {TOK_SQL}, {SHINGLE_SQL},
hx AS (SELECT doc_id, shingle, h FROM sh, UNNEST(range(0, 8)) u(h)),
mh AS (
  SELECT doc_id, h, min(md5(h || ':' || shingle)) AS minhash
  FROM hx GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, h // 2 AS band,
         md5(array_to_string(list_sort(list(minhash)), '|')) AS band_hash
  FROM mh GROUP BY 1, 2
),
p AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS n_common
  FROM p
  JOIN sh a ON a.doc_id = p.id_a
  JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
j AS (
  SELECT p.id_a, p.id_b,
         round(coalesce(i.n_common, 0)
               / (sa.n_sh + sb.n_sh - coalesce(i.n_common, 0)), 6) AS jaccard
  FROM p
  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
  JOIN sizes sa ON sa.doc_id = p.id_a
  JOIN sizes sb ON sb.doc_id = p.id_b
)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5
"""

QUERIES["dedup_verify"] = q_dedup_verify
ORACLES["dedup_verify"] = ORACLE_DEDUP_VERIFY


def q_source_cap(spark, sf_dir):
    """Per-source quota capping (corpus.source_cap): at most 30 docs per
    source, md5-ordered unbiased deterministic selection."""
    from .operators.corpus import source_cap

    return source_cap(_docs(spark, sf_dir), "doc_id", "source", cap=30)


ORACLE_SOURCE_CAP = """
WITH k AS (
  SELECT doc_id, source,
         md5('cap1:' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY k, doc_id) AS keep_rank
  FROM k
)
SELECT doc_id, source, CAST(keep_rank AS BIGINT) AS keep_rank
FROM r WHERE keep_rank <= 30
"""

QUERIES["source_cap"] = q_source_cap
ORACLES["source_cap"] = ORACLE_SOURCE_CAP


def q_semantic_decontaminate(spark, sf_dir):
    """Embedding-space decontamination (similarity.
    semantic_decontaminate): vec_id < 5 plays the benchmark; every other
    vector reports its max cosine to the benchmark and a leak flag."""
    e = _embs(spark, sf_dir)
    return sim.semantic_decontaminate(
        e.filter(F.col("vec_id") >= 5),
        e.filter(F.col("vec_id") < 5),
        "vec_id", "embedding", threshold=0.9, dims=64,
    )


ORACLE_SEMANTIC_DECONTAM = """
WITH norms AS (
  SELECT vec_id, sqrt(sum(x * x)) AS nrm
  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
  GROUP BY vec_id
),
pairs AS (
  SELECT c.vec_id, b.vec_id AS bench_id,
         sum(c.embedding[d.d]::DOUBLE * b.embedding[d.d]::DOUBLE) AS dot
  FROM embeddings c, embeddings b, UNNEST(range(1, 65)) d(d)
  WHERE c.vec_id >= 5 AND b.vec_id < 5
  GROUP BY 1, 2
),
scored AS (
  SELECT p.vec_id, p.bench_id,
         round(p.dot / (nc.nrm * nb.nrm), 6) AS cosine
  FROM pairs p
  JOIN norms nc ON nc.vec_id = p.vec_id
  JOIN norms nb ON nb.vec_id = p.bench_id
),
best AS (
  SELECT vec_id, cosine AS max_cosine, bench_id AS nearest_bench_id
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, bench_id ASC
    ) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT vec_id, max_cosine, nearest_bench_id,
       CAST(max_cosine >= 0.9 AS INTEGER) AS contaminated
FROM best
"""

QUERIES["semantic_decontaminate"] = q_semantic_decontaminate
ORACLES["semantic_decontaminate"] = ORACLE_SEMANTIC_DECONTAM


def q_url_dedup(spark, sf_dir):
    """Canonical-URL dedup (urls.url_dedup): the gate synthesizes messy
    crawl URLs from doc_id arithmetic — scheme case, www. prefix, :443
    port, fragments, tracking params, unsorted params, trailing slash —
    runs the real regex canonicalizer, and the oracle computes the
    EXPECTED canonical form directly from the same arithmetic (an
    independent derivation, not a reimplementation of the regexes)."""
    from .operators.urls import url_dedup

    d = _docs(spark, sf_dir)
    m = F.col("doc_id") % 5
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
        F.when(F.col("doc_id") % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".example.com"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/doc/"),
        (F.col("doc_id") % 211).cast("string"),
        F.when(m == 0, F.lit("/?utm_source=feed&x=1"))
        .when(m == 1, F.lit("?x=1"))
        .when(m == 2, F.lit("#frag"))
        .when(m == 3, F.lit("?b=2&a=1&utm_campaign=x"))
        .otherwise(F.lit("/")),
    )
    return url_dedup(d.withColumn("url", url), "url", "doc_id").orderBy(
        "canonical_url"
    )


ORACLE_URL_DEDUP = """
WITH canon AS (
  SELECT doc_id,
         'https://' || source || '.example.com/doc/' || CAST(doc_id % 211 AS VARCHAR)
         || CASE WHEN doc_id % 5 IN (0, 1) THEN '?x=1'
                 WHEN doc_id % 5 = 3 THEN '?a=1&b=2'
                 ELSE '' END AS canonical_url
  FROM documents
)
SELECT canonical_url, min(doc_id) AS keeper_id, count(*) AS group_size
FROM canon GROUP BY 1 ORDER BY 1
"""

QUERIES["url_dedup"] = q_url_dedup
ORACLES["url_dedup"] = ORACLE_URL_DEDUP


_BOILER = (
    " subscribe to our newsletter for more updates and exclusive offers today"
)


def q_repeated_ngrams(spark, sf_dir):
    """Substring-level duplication signal (corpus.repeated_ngram_stats,
    the Lee-et-al exact-substring pass as fixed-8-token windows): every
    fourth doc gets a boilerplate sentence appended so cross-document
    repeats exist by construction; windows travel the shuffle as
    (doc, pos, xxhash64) longs and the per-doc interval union is an
    in-row fold. The oracle groups by the n-gram STRING itself —
    hash-independent."""
    from .operators.corpus import repeated_ngram_stats

    d = _docs(spark, sf_dir)
    aug = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(_BOILER))
        ).otherwise(F.col("text")),
    )
    return repeated_ngram_stats(aug, "doc_id", "text", n=8, min_occurrences=2)


ORACLE_REPEATED_NGRAMS = rf"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN text || '{_BOILER}' ELSE text END AS text
  FROM documents
), toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
  FROM aug
), base AS (SELECT doc_id, t, len(t) AS total FROM toks),
win AS (
  SELECT doc_id, CAST(pos AS INT) AS pos,
         array_to_string(t[CAST(pos+1 AS INT):CAST(pos+8 AS INT)], chr(31)) AS w
  FROM (SELECT doc_id, t, unnest(range(0, greatest(total - 7, 0))) AS pos FROM base)
),
hot AS (SELECT w FROM win GROUP BY w HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM win JOIN hot USING (w)),
contrib AS (
  SELECT doc_id,
         coalesce(least(8, pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)), 8) AS c
  FROM hits
),
per_doc AS (
  SELECT doc_id, count(*) AS repeated_windows, sum(c) AS masked FROM contrib GROUP BY 1
)
SELECT b.doc_id, CAST(b.total AS BIGINT) AS total_tokens,
       CAST(coalesce(p.repeated_windows, 0) AS BIGINT) AS repeated_windows,
       CAST(coalesce(p.masked, 0) AS BIGINT) AS masked_tokens,
       floor(coalesce(p.masked, 0) * 1e6 / greatest(b.total, 1) + 0.5) / 1e6 AS repeated_frac
FROM base b LEFT JOIN per_doc p USING (doc_id)
"""

QUERIES["repeated_ngrams"] = q_repeated_ngrams
ORACLES["repeated_ngrams"] = ORACLE_REPEATED_NGRAMS


def q_emb_pq(spark, sf_dir):
    """Product quantization (similarity.pq_codes): 64 dims → 4
    subspaces × 16-dim codebooks of size 4, 2 euclidean Lloyd
    iterations per subspace; (vec_id, subspace, code) rows. The oracle
    replays the full per-subspace train+encode trajectory with unrolled
    CTEs (the kmeans_iterations oracle technique, once per subspace)."""
    return sim.pq_codes(
        _embs(spark, sf_dir), "vec_id", "embedding", dims=64, m=4, k=4, iterations=2
    )


def _pq_parts(dims: int = 64, m: int = 4, k: int = 4, iterations: int = 2):
    sub = dims // m
    rng = f"UNNEST(range(1, {sub + 1})) AS d(d)"
    parts = []
    selects = []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        parts.append(
            f"sub{j} AS (SELECT vec_id, embedding[{lo}:{hi}] AS sv FROM embeddings)"
        )
        parts.append(f"""c{j}_0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell, sv AS cv
  FROM sub{j} ORDER BY vec_id LIMIT {k}
)""")
        dist = (
            "round(sum((e.sv[d.d]::DOUBLE - c.cv[d.d]::DOUBLE)"
            " * (e.sv[d.d]::DOUBLE - c.cv[d.d]::DOUBLE)), 6)"
        )
        for i in range(iterations):
            parts.append(f"""s{j}_{i} AS (
  SELECT e.vec_id, c.cell, {dist} AS s
  FROM sub{j} e, c{j}_{i} c, {rng}
  GROUP BY e.vec_id, c.cell
)""")
            parts.append(f"""a{j}_{i} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY s ASC, cell ASC) AS rn
    FROM s{j}_{i}) WHERE rn = 1
)""")
            # a cell that loses all members keeps its previous
            # centroid — every iteration coalesces against the prior
            parts.append(f"""n{j}_{i + 1} AS (
  SELECT cell, list(cm ORDER BY d) AS cv FROM (
    SELECT a.cell, d.d AS d, round(avg(e.sv[d.d]::DOUBLE), 6) AS cm
    FROM a{j}_{i} a JOIN sub{j} e USING (vec_id), {rng}
    GROUP BY a.cell, d.d
  ) GROUP BY cell
)""")
            parts.append(f"""c{j}_{i + 1} AS (
  SELECT p.cell, coalesce(n.cv, p.cv) AS cv
  FROM c{j}_{i} p LEFT JOIN n{j}_{i + 1} n USING (cell)
)""")
        parts.append(f"""sf{j} AS (
  SELECT e.vec_id, c.cell, {dist} AS s
  FROM sub{j} e, c{j}_{iterations} c, {rng}
  GROUP BY e.vec_id, c.cell
)""")
        selects.append(f"""SELECT vec_id, {j} AS subspace, CAST(cell - 1 AS INT) AS code
FROM (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY s ASC, cell ASC) AS rn
  FROM sf{j}) WHERE rn = 1""")
    return parts, selects


def _pq_oracle_sql(dims: int = 64, m: int = 4, k: int = 4, iterations: int = 2) -> str:
    parts, selects = _pq_parts(dims, m, k, iterations)
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


ORACLE_EMB_PQ = _pq_oracle_sql()

QUERIES["emb_pq"] = q_emb_pq
ORACLES["emb_pq"] = ORACLE_EMB_PQ


def q_emb_pq_adc(spark, sf_dir):
    """PQ asymmetric-distance search (similarity.pq_adc_topn): the
    query (= the min-id vector, full precision) scores every encoded
    vector as a sum of m lookup-table entries — stored vectors never
    touched. Deterministic top-10 by (distance, id)."""
    embs = _embs(spark, sf_dir)
    books = sim.pq_train(embs, "vec_id", "embedding", dims=64, m=4, k=4, iterations=2)
    codes = sim.pq_codes(
        embs, "vec_id", "embedding", dims=64, m=4, k=4, codebooks=books
    )
    query = [
        float(x)
        for x in embs.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    ]
    return sim.pq_adc_topn(codes, books, query, n=10)


def _pq_adc_oracle_sql(dims: int = 64, m: int = 4, k: int = 4, iterations: int = 2) -> str:
    sub = dims // m
    rng = f"UNNEST(range(1, {sub + 1})) AS d(d)"
    parts, code_selects = _pq_parts(dims, m, k, iterations)
    parts.append("codes AS (\n" + "\nUNION ALL\n".join(code_selects) + "\n)")
    lut_selects = []
    for j in range(m):
        parts.append(
            f"q{j} AS (SELECT sv FROM sub{j} "
            f"WHERE vec_id = (SELECT min(vec_id) FROM embeddings))"
        )
        parts.append(f"""lut{j} AS (
  SELECT c.cell,
         round(sum((q.sv[d.d]::DOUBLE - c.cv[d.d]::DOUBLE)
                   * (q.sv[d.d]::DOUBLE - c.cv[d.d]::DOUBLE)), 6) AS pd
  FROM c{j}_{iterations} c, q{j} q, {rng}
  GROUP BY c.cell
)""")
        lut_selects.append(
            f"SELECT {j} AS subspace, CAST(cell - 1 AS INT) AS code, pd FROM lut{j}"
        )
    parts.append("lut AS (\n" + "\nUNION ALL\n".join(lut_selects) + "\n)")
    return (
        "WITH " + ",\n".join(parts) + "\n"
        + """SELECT vec_id, round(sum(l.pd), 6) AS adc_dist
FROM codes JOIN lut l USING (subspace, code)
GROUP BY vec_id
ORDER BY adc_dist ASC, vec_id ASC
LIMIT 10"""
    )


ORACLE_EMB_PQ_ADC = _pq_adc_oracle_sql()

QUERIES["emb_pq_adc"] = q_emb_pq_adc
ORACLES["emb_pq_adc"] = ORACLE_EMB_PQ_ADC


def q_corpus_report(spark, sf_dir):
    """Per-source dataset-card report (corpus.corpus_report): doc
    counts, length stats, quality pass rate, exact-dup rate — the
    composition table a curation run publishes; one partial+final agg,
    text contributes only per-row scalars and a digest."""
    from .operators.corpus import corpus_report

    return corpus_report(_docs(spark, sf_dir), "doc_id", "text")


ORACLE_CORPUS_REPORT = f"""
WITH n AS (SELECT doc_id, source, {NORM_SQL} AS t FROM documents),
f AS (
  SELECT doc_id, source, t,
         length(t) AS n_chars,
         len(string_split(t, ' ')) AS n_words,
         len(regexp_extract_all(t, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(t, '\\b(the|and|of|is|a|to|in)\\b')) AS n_stop
  FROM n
), scored AS (
  SELECT source, n_chars, n_words, md5(t) AS digest,
         least(1.0, greatest(0.0,
             0.5 + 2.0 * (n_stop / greatest(n_words, 1))
                 - 3.0 * (n_punct / greatest(n_chars, 1))
                 - abs((n_chars - (n_words - 1)) / greatest(n_words, 1) - 5.0) / 10.0))
         AS score
  FROM f
)
SELECT source,
       count(*) AS docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       floor(avg(n_words) * 1e6 + 0.5) / 1e6 AS mean_words,
       floor(avg(floor(score * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) / 1e6 AS mean_quality,
       floor(avg(CASE WHEN floor(score * 1e6 + 0.5) / 1e6 >= 0.5 THEN 1.0 ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS quality_pass_rate,
       floor((1.0 - count(DISTINCT digest) / count(*)) * 1e6 + 0.5) / 1e6 AS exact_dup_rate
FROM scored GROUP BY source ORDER BY source
"""

QUERIES["corpus_report"] = q_corpus_report
ORACLES["corpus_report"] = ORACLE_CORPUS_REPORT


def q_emb_ivf_pq(spark, sf_dir):
    """IVF-PQ (similarity.ivf_pq_topn) — the FAISS IndexIVFPQ shape:
    coarse cells restrict candidates (nprobe nearest of 8 cells), ADC
    over PQ codes scores only those candidates; top-10 by (dist, id).
    The oracle replays the coarse assignment, the probe ranking, the PQ
    trajectory, AND the lookup-table scoring."""
    embs = _embs(spark, sf_dir)
    query = [
        float(x)
        for x in embs.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    ]
    return sim.ivf_pq_topn(
        embs, query, "vec_id", "embedding", dims=64, n_cells=8, nprobe=2,
        m=4, k=4, iterations=2, n=10,
    )


def _ivf_pq_oracle_sql(
    dims: int = 64, n_cells: int = 8, nprobe: int = 2,
    m: int = 4, k: int = 4, iterations: int = 2, n: int = 10,
) -> str:
    sub = dims // m
    rng = f"UNNEST(range(1, {sub + 1})) AS d(d)"
    full_rng = f"UNNEST(range(1, {dims + 1})) AS fd(fd)"
    parts, code_selects = _pq_parts(dims, m, k, iterations)
    parts.append("codes AS (\n" + "\nUNION ALL\n".join(code_selects) + "\n)")
    cos = (
        "round(sum(a.v[fd.fd]::DOUBLE * c.cv[fd.fd]::DOUBLE)"
        " / (sqrt(sum(a.v[fd.fd]::DOUBLE * a.v[fd.fd]::DOUBLE))"
        " * sqrt(sum(c.cv[fd.fd]::DOUBLE * c.cv[fd.fd]::DOUBLE))), 6)"
    )
    parts.append(f"""coarse AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell, embedding AS cv
  FROM embeddings ORDER BY vec_id LIMIT {n_cells}
)""")
    parts.append("""qv AS (
  SELECT embedding AS v FROM embeddings
  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
)""")
    parts.append(f"""qcos AS (
  SELECT c.cell, {cos} AS s FROM coarse c, qv a, {full_rng} GROUP BY c.cell
)""")
    parts.append(f"""probe AS (
  SELECT cell FROM (
    SELECT cell, row_number() OVER (ORDER BY s DESC, cell ASC) AS rk FROM qcos
  ) WHERE rk <= {nprobe}
)""")
    parts.append(f"""asg_s AS (
  SELECT a.vec_id, c.cell, {cos} AS s
  FROM (SELECT vec_id, embedding AS v FROM embeddings) a, coarse c, {full_rng}
  GROUP BY a.vec_id, c.cell
)""")
    parts.append("""cand AS (
  SELECT vec_id FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell ASC) AS rk
    FROM asg_s
  ) WHERE rk = 1 AND cell IN (SELECT cell FROM probe)
)""")
    lut_selects = []
    for j in range(m):
        parts.append(
            f"q{j} AS (SELECT sv FROM sub{j} "
            f"WHERE vec_id = (SELECT min(vec_id) FROM embeddings))"
        )
        parts.append(f"""lut{j} AS (
  SELECT c.cell,
         round(sum((q.sv[d.d]::DOUBLE - c.cv[d.d]::DOUBLE)
                   * (q.sv[d.d]::DOUBLE - c.cv[d.d]::DOUBLE)), 6) AS pd
  FROM c{j}_{iterations} c, q{j} q, {rng}
  GROUP BY c.cell
)""")
        lut_selects.append(
            f"SELECT {j} AS subspace, CAST(cell - 1 AS INT) AS code, pd FROM lut{j}"
        )
    parts.append("lut AS (\n" + "\nUNION ALL\n".join(lut_selects) + "\n)")
    return (
        "WITH " + ",\n".join(parts) + "\n"
        + f"""SELECT codes.vec_id, round(sum(l.pd), 6) AS adc_dist
FROM codes JOIN cand USING (vec_id) JOIN lut l USING (subspace, code)
GROUP BY codes.vec_id
ORDER BY adc_dist ASC, codes.vec_id ASC
LIMIT {n}"""
    )


ORACLE_EMB_IVF_PQ = _ivf_pq_oracle_sql()

QUERIES["emb_ivf_pq"] = q_emb_ivf_pq
ORACLES["emb_ivf_pq"] = ORACLE_EMB_IVF_PQ


def q_text_entropy(spark, sf_dir):
    """Per-document character Shannon entropy (bits/char) — the cheap
    gibberish/compression-ratio quality signal (low entropy = repeated
    boilerplate, high = random noise). Explode to (doc, char) longs,
    two partial-agg groupBys; nothing but the doc id shuffles twice."""
    d = _docs(spark, sf_dir)
    chars = d.select(
        "doc_id", F.explode(F.expr("regexp_extract_all(text, '.', 0)")).alias("ch")
    )
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
            F.max("n").cast("long").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


ORACLE_TEXT_ENTROPY = """
WITH chars AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch FROM documents
), freq AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM chars GROUP BY 1, 2
), tot AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM freq GROUP BY 1
)
SELECT doc_id,
       round(-sum((c::DOUBLE / n) * log2(c::DOUBLE / n)), 6) AS entropy_bits,
       CAST(max(n) AS BIGINT) AS n_chars
FROM freq JOIN tot USING (doc_id) GROUP BY doc_id ORDER BY doc_id
"""

QUERIES["text_entropy"] = q_text_entropy
ORACLES["text_entropy"] = ORACLE_TEXT_ENTROPY


def q_unigram_logprob(spark, sf_dir):
    """Corpus unigram LM scoring: avg(−ln p(token)) per document, the
    classic quality/outlier filter a full KenLM replaces at scale. The
    vocabulary is corpus-derived (one groupBy), then one join token→freq
    and a per-doc agg; the vocab rides a broadcast."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("total"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("total"))), 6).alias(
                "avg_neg_logprob"
            ),
        )
        .orderBy("doc_id")
    )


ORACLE_UNIGRAM_LOGPROB = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
  FROM documents
), t2 AS (
  SELECT * FROM toks WHERE tok <> ''
), vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t2 GROUP BY 1
), n AS (
  SELECT CAST(sum(c) AS DOUBLE) AS total FROM vocab
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-ln(c::DOUBLE / total)), 6) AS avg_neg_logprob
FROM t2 JOIN vocab USING (tok), n GROUP BY doc_id ORDER BY doc_id
"""

QUERIES["unigram_logprob"] = q_unigram_logprob
ORACLES["unigram_logprob"] = ORACLE_UNIGRAM_LOGPROB


def q_dedup_containment(spark, sf_dir):
    """Shingle containment |A∩B| / min(|A|,|B|) ≥ 0.4 — near-superset
    detection (dedup.containment_pairs): finds a doc embedded in a
    bigger one where symmetric Jaccard stays low."""
    d = _docs(spark, sf_dir)
    return dd.containment_pairs(
        d, "doc_id", "text", n=3, threshold=0.4, max_shingle_df=100
    ).orderBy("id_a", "id_b")


ORACLE_DEDUP_CONTAINMENT = f"""
WITH {TOK_SQL}, {SHINGLE_SQL},
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
hot AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 100
),
kept AS (
  SELECT doc_id, shingle FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_common
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(n_common / least(sa.n_sh, sb.n_sh), 6) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / least(sa.n_sh, sb.n_sh) >= 0.4
ORDER BY id_a, id_b
"""

QUERIES["dedup_containment"] = q_dedup_containment
ORACLES["dedup_containment"] = ORACLE_DEDUP_CONTAINMENT


def q_emb_mips_topk(spark, sf_dir):
    """Exact maximum-inner-product top-k (similarity.mips_topk) — the
    unnormalized-retrieval dual of emb_cosine_topk."""
    e = _embs(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < 10)
    return sim.mips_topk(e, queries, "vec_id", "embedding", k=5, dims=64)


ORACLE_EMB_MIPS_TOPK = """
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(sum(q.embedding[d.d]::DOUBLE * c.embedding[d.d]::DOUBLE), 6) AS dot
  FROM embeddings q, embeddings c, UNNEST(range(1, 65)) d(d)
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, dot,
         row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rk
  FROM pairs
)
SELECT query_id, neighbor_id, dot, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 5
"""

QUERIES["emb_mips_topk"] = q_emb_mips_topk
ORACLES["emb_mips_topk"] = ORACLE_EMB_MIPS_TOPK
