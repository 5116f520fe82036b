#!/usr/bin/env python3
"""Generates the DuckDB oracle SQL for the sketch/ANN/multimodal
catalog queries whose Spark side uses graft's native hashing
(FNV-1a 64 + splitmix64 finalizer, graft.functions.Hashing) or
deterministic float math. The generated SQL recomputes every hash in
pure DuckDB HUGEINT modular arithmetic (mod 2^64), with lambda
"let-bindings" (list_transform([x], v -> body)[1]) to keep each
subexpression evaluated once — and, crucially, implements the NAIVE
all-pairs algorithm, independently cross-checking the banded/blocked
distributed Spark plans.

Usage:
  python3 tools/gen_sketch_oracles.py out.json    # write {name: sql}
The SQL is then embedded in src/main/scala/graft/SketchOracles.scala
(this script is the provenance + regeneration path).
"""
import json
import sys

M64 = "18446744073709551616::HUGEINT"   # 2^64
MASK64 = "18446744073709551615::HUGEINT" # 2^64 - 1
S63 = "9223372036854775808::HUGEINT"    # 2^63
LMAX = "9223372036854775807::HUGEINT"   # Long.MaxValue

_ctr = [0]
def _v(p):
    _ctr[0] += 1
    return f"{p}{_ctr[0]}"

def let(val, body_fn):
    """SQL let-binding: bind `val` to a fresh variable, body_fn(var)."""
    v = _v("g")
    return f"list_transform([{val}], {v} -> {body_fn(v)})[1]"

def mulmod(a_var, b_lit):
    """(a*b) mod 2^64 for bound var a < 2^64, literal b < 2^64.
    Split a into 32-bit halves so no intermediate exceeds HUGEINT."""
    return (f"((((({a_var} >> 32) * {b_lit}) & 4294967295::HUGEINT)"
            f" << 32)"
            f" + ({a_var} & 4294967295::HUGEINT) * {b_lit}) & {MASK64}")

def mix64(z0_expr):
    """splitmix64 finalizer of Hashing.mix64, arg/result in [0, 2^64)."""
    return let(z0_expr, lambda a:
           let(f"({a} + 11400714819323198485::HUGEINT) & {MASK64}", lambda z1:
           let(f"xor({z1}, {z1} >> 30)", lambda x1:
           let(mulmod(x1, "13787848793156543929::HUGEINT"), lambda z2:
           let(f"xor({z2}, {z2} >> 27)", lambda x2:
           let(mulmod(x2, "10723151780598845931::HUGEINT"), lambda z3:
               f"xor({z3}, {z3} >> 31)"))))))

def utf8_bytes(s_expr):
    """UTF-8 byte list (HUGEINT) of a string expr — codepoints expanded
    per the UTF-8 spec so multi-byte chars match JVM getBytes."""
    cp = f"[unicode(({s_expr})[i+1:i+1])::HUGEINT for i in range(length({s_expr}))]"
    return (f"flatten(list_transform({cp}, cp -> CASE"
            f" WHEN cp < 128 THEN [cp]"
            f" WHEN cp < 2048 THEN [192 + cp//64, 128 + cp%64]"
            f" WHEN cp < 65536 THEN [224 + cp//4096, 128 + (cp//64)%64, 128 + cp%64]"
            f" ELSE [240 + cp//262144, 128 + (cp//4096)%64, 128 + (cp//64)%64,"
            f" 128 + cp%64] END))")

def fnv1a_over(bytes_expr, basis="14695981039346656037::HUGEINT"):
    """FNV-1a 64 fold over a HUGEINT byte list (Hashing.fnv1a64)."""
    return (f"list_reduce(list_concat([{basis}], {bytes_expr}),"
            f" (h, c) -> (xor(h, c) * 1099511628211::HUGEINT) & {MASK64})")

def hash64(s_expr):
    """Hashing.hash64 = mix64(fnv1a64(utf8(s))), in [0, 2^64)."""
    return mix64(fnv1a_over(utf8_bytes(s_expr)))

def to_signed(x_expr):
    """[0,2^64) HUGEINT -> signed two's-complement (still HUGEINT)."""
    return let(x_expr, lambda x:
               f"CASE WHEN {x} >= {S63} THEN {x} - {M64} ELSE {x} END")

def to_bigint(x_expr):
    return f"CAST({to_signed(x_expr)} AS BIGINT)"

# Tokenizer twin of Hashing.tokenize: lowercase, split on
# non-letter/digit runs, drop empties.
def toks(text_col):
    return (f"list_filter(regexp_split_to_array(lower({text_col}),"
            f" '[^\\p{{L}}\\p{{N}}]+'), tk -> tk <> '')")

def minhash_seeds():
    """Twin of Hashing.minHashSeeds(64): splitmix chain from the fixed
    root 0x5eed5eed5eed5eed, as unsigned [0,2^64) ints."""
    MASK = (1 << 64) - 1
    def pmix(z):
        z = (z + 0x9e3779b97f4a7c15) & MASK
        z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) & MASK
        z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) & MASK
        return z ^ (z >> 31)
    out, s = [], 0x5eed5eed5eed5eed
    for _ in range(64):
        s = pmix(s)
        out.append(s)
    return out

def mix64_staged(carry, in_expr, from_clause, out_name="h"):
    """mix64 as a chain of nested SELECTs (one vectorized column pass
    per step — no per-row list allocation, no subexpression
    recomputation). `carry` = columns to pass through."""
    c = ", ".join(carry)
    q1 = f"(SELECT {c}, (({in_expr}) + 11400714819323198485::HUGEINT) & {MASK64} AS m_z1 FROM {from_clause})"
    q2 = f"(SELECT {c}, xor(m_z1, m_z1 >> 30) AS m_x1 FROM {q1})"
    q3 = f"(SELECT {c}, {mulmod('m_x1', '13787848793156543929::HUGEINT')} AS m_z2 FROM {q2})"
    q4 = f"(SELECT {c}, xor(m_z2, m_z2 >> 27) AS m_x2 FROM {q3})"
    q5 = f"(SELECT {c}, {mulmod('m_x2', '10723151780598845931::HUGEINT')} AS m_z3 FROM {q4})"
    return f"(SELECT {c}, xor(m_z3, m_z3 >> 31) AS {out_name} FROM {q5})"


def duck_cosine(a, b):
    """Twin of SparkEntry.duckCosine (bit-identical to
    Functions.cosine_sim, proven by f4_cosine_pairs)."""
    return (f"(list_aggregate(list_transform(list_zip({a}, {b}),"
            f" x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
            f" / (sqrt(list_aggregate(list_transform({a},"
            f" x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))"
            f" * sqrt(list_aggregate(list_transform({b},"
            f" x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))))")


def gen_dedup_simhash():
    """Naive all-pairs twin of Dedup.simHash (maxHamming=3): per-doc
    64-bit SimHash over the token multiset, then every pair with
    bit_count(xor) <= 3 — independently verifying the 4x16-bit
    pigeonhole chunk blocking of the Spark plan."""
    tok_hashes = f"list_transform({toks('text')}, tkh -> {hash64('tkh')})"
    # bit b set iff strictly more token hashes have bit b than not
    sim_u = let(tok_hashes, lambda hs:
        f"list_reduce(list_concat([0::HUGEINT], [CASE WHEN"
        f" 2*len(list_filter({hs}, h -> (h >> b) % 2 = 1)) > len({hs})"
        f" THEN (1::HUGEINT << b) ELSE 0::HUGEINT END for b in range(64)]),"
        f" (acc, x) -> acc + x)")
    return f"""WITH sh AS MATERIALIZED (
  SELECT doc_id, CAST({to_signed(sim_u)} AS BIGINT) AS sim FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.sim, b.sim)) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= 3
ORDER BY id_a, id_b"""


def gen_dedup_minhash_lsh():
    """Naive all-pairs twin of Dedup.minHashLsh (numHashes=64,
    bands=16, rowsPerBand=4, threshold=0.5): per-doc 64-long MinHash
    signature over word-3-gram shingles; a pair is a candidate iff
    some band's 4 signature rows are equal (the Spark side compares
    xxhash64 of the band slice — equal slices <=> equal hashes modulo
    negligible collisions); est_jaccard = agreeing positions / 64."""
    seeds_rows = ", ".join(f"({i}, {s}::HUGEINT)"
                           for i, s in enumerate(minhash_seeds()))
    t = toks("text")
    shingles = let(t, lambda tk:
        f"CASE WHEN len({tk}) = 0 THEN []"
        f" WHEN len({tk}) < 3 THEN [array_to_string({tk}, ' ')]"
        f" ELSE [array_to_string({tk}[i+1:i+3], ' ') for i in range(len({tk})-2)] END")
    # signature position i = SIGNED min over shingles of mix64(base ^ seed_i),
    # computed relationally (shingle x seed rows -> min per (doc, i)) so
    # DuckDB vectorizes the mix64 arithmetic; Long.MaxValue for an empty
    # shingle set, as in Hashing.minHash
    return f"""WITH sh AS (
  SELECT doc_id, {shingles} AS shingles FROM documents
),
base AS (
  SELECT doc_id, {hash64('sgl')} AS b
  FROM (SELECT doc_id, unnest(shingles) AS sgl FROM sh)
),
seeds AS (SELECT * FROM (VALUES {seeds_rows}) v(i, sd)),
mixed AS (
  SELECT doc_id, i,
    CASE WHEN h >= {S63} THEN h - {M64} ELSE h END AS hs
  FROM {mix64_staged(['doc_id', 'i'], 'xor(b, sd)', '(SELECT * FROM base, seeds)')}
),
mh AS MATERIALIZED (SELECT doc_id, i, min(hs) AS s FROM mixed GROUP BY doc_id, i),
-- per-position signature rows, with all-MaxValue sentinel rows for
-- docs whose shingle set is empty (Hashing.minHash's convention)
pos AS MATERIALIZED (
  SELECT doc_id, i, s FROM mh
  UNION ALL
  SELECT d.doc_id, seeds.i, {LMAX} AS s FROM documents d, seeds
  WHERE d.doc_id NOT IN (SELECT doc_id FROM mh)
),
-- positions where two docs' signatures agree (relational: join on
-- (position, value) — the naive-all-pairs twin of LSH banding)
agree AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.i
  FROM pos a JOIN pos b ON a.i = b.i AND a.s = b.s AND a.doc_id < b.doc_id
),
cnt AS (SELECT id_a, id_b, count(*) AS n_agree FROM agree GROUP BY id_a, id_b),
-- LSH candidate = some band (4 consecutive positions) fully agrees
band AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT id_a, id_b FROM agree GROUP BY id_a, id_b, i // 4
    HAVING count(*) = 4)
)
SELECT c.id_a, c.id_b, round(c.n_agree / 64.0, 4) AS est_jaccard
FROM cnt c JOIN band USING (id_a, id_b)
WHERE c.n_agree / 64.0 >= 0.5
ORDER BY id_a, id_b"""


def gen_dedup_lsh_verified():
    """LSH-then-verify twin of Dedup.lshVerified (numHashes=64,
    bands=16, estThreshold=0.5, threshold=0.7): candidate pairs exactly
    as gen_dedup_minhash_lsh, then the EXACT distinct-token Jaccard
    (norm_text split on single space, empty tokens kept — the twin of
    Spark's array_distinct(split(norm_text(text), ' '))) on the
    survivors. floor(x*1e4+0.5)/1e4 rounding both engines: est = k/64
    hits exact halfway doubles where round() half-even diverges."""
    seeds_rows = ", ".join(f"({i}, {s}::HUGEINT)"
                           for i, s in enumerate(minhash_seeds()))
    t = toks("text")
    shingles = let(t, lambda tk:
        f"CASE WHEN len({tk}) = 0 THEN []"
        f" WHEN len({tk}) < 3 THEN [array_to_string({tk}, ' ')]"
        f" ELSE [array_to_string({tk}[i+1:i+3], ' ') for i in range(len({tk})-2)] END")
    split_norm = ("list_distinct(string_split(regexp_replace(lower(trim(text)),"
                  " '\\s+', ' ', 'g'), ' '))")
    return f"""WITH sh AS (
  SELECT doc_id, {shingles} AS shingles FROM documents
),
base AS (
  SELECT doc_id, {hash64('sgl')} AS b
  FROM (SELECT doc_id, unnest(shingles) AS sgl FROM sh)
),
seeds AS (SELECT * FROM (VALUES {seeds_rows}) v(i, sd)),
mixed AS (
  SELECT doc_id, i,
    CASE WHEN h >= {S63} THEN h - {M64} ELSE h END AS hs
  FROM {mix64_staged(['doc_id', 'i'], 'xor(b, sd)', '(SELECT * FROM base, seeds)')}
),
mh AS MATERIALIZED (SELECT doc_id, i, min(hs) AS s FROM mixed GROUP BY doc_id, i),
pos AS MATERIALIZED (
  SELECT doc_id, i, s FROM mh
  UNION ALL
  SELECT d.doc_id, seeds.i, {LMAX} AS s FROM documents d, seeds
  WHERE d.doc_id NOT IN (SELECT doc_id FROM mh)
),
agree AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.i
  FROM pos a JOIN pos b ON a.i = b.i AND a.s = b.s AND a.doc_id < b.doc_id
),
cnt AS (SELECT id_a, id_b, count(*) AS n_agree FROM agree GROUP BY id_a, id_b),
band AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT id_a, id_b FROM agree GROUP BY id_a, id_b, i // 4
    HAVING count(*) = 4)
),
cand AS (
  SELECT c.id_a, c.id_b, c.n_agree / 64.0 AS est
  FROM cnt c JOIN band USING (id_a, id_b)
  WHERE c.n_agree / 64.0 >= 0.5
),
tk AS MATERIALIZED (
  SELECT doc_id, len({split_norm}) AS ntok, unnest({split_norm}) AS token
  FROM documents
),
ver AS (
  SELECT cand.id_a, cand.id_b, cand.est,
         any_value(a.ntok) AS ntok_a, any_value(b.ntok) AS ntok_b,
         count(*) AS inter
  FROM cand JOIN tk a ON a.doc_id = cand.id_a
            JOIN tk b ON b.doc_id = cand.id_b AND b.token = a.token
  GROUP BY cand.id_a, cand.id_b, cand.est
)
SELECT id_a, id_b,
  floor(est * 1e4 + 0.5) / 1e4 AS est_jaccard,
  floor((CAST(inter AS DOUBLE) / (ntok_a + ntok_b - inter)) * 1e4 + 0.5) / 1e4 AS jaccard
FROM ver
WHERE CAST(inter AS DOUBLE) / (ntok_a + ntok_b - inter) >= 0.7
ORDER BY id_a, id_b"""


def gen_ann_lsh_topk():
    """Twin of Ann.lshTopK (k=3, nBits=12, tables=4, dim=64) over the
    embeddings table: deterministic hyperplanes from mix64, sign-bit
    signatures with the same sequential double accumulation, exact
    cosine within buckets, global top-3 per query across tables."""
    # hyperplane component: toFloat(toDouble(signed mix64((t<<42)^(b<<21)^d^0x1234abcd)) / Long.MaxValue)
    plane_d = (f"CAST(CAST({to_signed(mix64('xor(xor(tt::HUGEINT << 42, bb::HUGEINT << 21), xor(dd::HUGEINT, 305441741::HUGEINT))'))}"
               f" AS DOUBLE) / 9223372036854775807.0 AS FLOAT)")
    return f"""WITH planes AS (
  SELECT tt AS tbl, bb AS bit,
    [{plane_d} for dd in range(64)] AS p
  FROM range(4) t1(tt), range(12) t2(bb)
),
vecs AS (
  SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS vec FROM embeddings
),
-- dot in the same order as the Scala loop: per-d double products
-- summed d = 0..63 sequentially (list_aggregate 'sum' is ordered)
bits AS (
  SELECT v.id, v.vec, pl.tbl, pl.bit,
    CASE WHEN list_aggregate(list_transform(list_zip(v.vec, pl.p),
      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') >= 0
    THEN (1::BIGINT << pl.bit) ELSE 0::BIGINT END AS sbit
  FROM vecs v, planes pl
),
sigs AS (
  SELECT id, any_value(vec) AS vec, tbl, sum(sbit) AS sig
  FROM bits GROUP BY id, tbl
),
pairs AS (
  SELECT a.id AS query_id, b.id AS id,
    max({duck_cosine('a.vec', 'b.vec')}) AS cos
  FROM sigs a JOIN sigs b ON a.tbl = b.tbl AND a.sig = b.sig AND a.id <> b.id
  GROUP BY a.id, b.id
)
SELECT query_id, CAST(rank AS INT) AS rank, id, cos FROM (
  SELECT query_id, id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rank
  FROM pairs)
WHERE rank <= 3
ORDER BY query_id, rank"""


def gen_ann_ivf_topk():
    """Twin of Ann.ivfTopK (k=3, nCentroids=16, nProbe=4, nAssign=1):
    centroids = the 16 vectors with smallest (hash64(id), id),
    re-indexed 0..15 in id-STRING order; each corpus vector joins its
    single nearest centroid's list (cos desc, centroid asc); queries
    probe their 4 nearest lists; exact cosine within probed lists,
    top-3 per query."""
    h = hash64("CAST(vec_id AS VARCHAR)")
    cos_vc = duck_cosine("v.vec", "c.cvec")
    return f"""WITH vecs AS (
  SELECT CAST(vec_id AS VARCHAR) AS id, embedding AS vec FROM embeddings
),
seeded AS (
  SELECT id, vec FROM (
    SELECT vec_id, CAST(vec_id AS VARCHAR) AS id, embedding AS vec,
      row_number() OVER (ORDER BY {to_bigint(h)} ASC,
                         CAST(vec_id AS VARCHAR) ASC) AS hrank
    FROM embeddings)
  WHERE hrank <= 16
),
centroids AS (
  SELECT CAST(row_number() OVER (ORDER BY id ASC) - 1 AS INT) AS centroid,
         vec AS cvec
  FROM seeded
),
scored_assign AS (
  SELECT v.id, v.vec, c.centroid, {cos_vc} AS cs FROM vecs v, centroids c
),
assigned AS (
  SELECT id, vec, centroid FROM (
    SELECT id, vec, centroid,
      row_number() OVER (PARTITION BY id ORDER BY cs DESC, centroid ASC) AS rn
    FROM scored_assign)
  WHERE rn <= 1
),
probes AS (
  SELECT id AS query_id, vec AS qvec, centroid FROM (
    SELECT id, vec, centroid,
      row_number() OVER (PARTITION BY id ORDER BY cs DESC, centroid ASC) AS rn
    FROM scored_assign)
  WHERE rn <= 4
),
pairs AS (
  SELECT p.query_id, a.id, {duck_cosine('p.qvec', 'a.vec')} AS cos
  FROM probes p JOIN assigned a
    ON p.centroid = a.centroid AND p.query_id <> a.id
)
SELECT query_id, CAST(rank AS INT) AS rank, id, round(cos, 6) AS cos FROM (
  SELECT query_id, id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rank
  FROM pairs)
WHERE rank <= 3
ORDER BY query_id, rank"""


def le32_h(v):
    """LE32 byte expansion of a nonnegative int expr, as HUGEINT list."""
    return (f"[(({v}) % 256)::HUGEINT, ((({v})//256) % 256)::HUGEINT,"
            f" ((({v})//65536) % 256)::HUGEINT, ((({v})//16777216) % 256)::HUGEINT]")

def le16_h(v):
    return f"[(({v}) % 256)::HUGEINT, ((({v})//256) % 256)::HUGEINT]"

def bytes_h(*vals):
    return "[" + ", ".join(f"{v}::HUGEINT" for v in vals) + "]"

def avi_header():
    """The fixed 224-byte header region of MediaSynth.avi as a HUGEINT
    byte list, in terms of SQL columns w, ht, nf, flen (RIFF 'AVI ' +
    LIST hdrl [avih + LIST strl [strh vids/'DIB ' + strf
    BITMAPINFOHEADER 24bpp]] + LIST movi tag)."""
    return ("flatten(["
            + ", ".join([
                bytes_h(82, 73, 70, 70),       # 'RIFF'
                le32_h("216 + nf*(8 + flen)"), # riff size = total - 8
                bytes_h(65, 86, 73, 32),       # 'AVI '
                bytes_h(76, 73, 83, 84),       # 'LIST'
                le32_h("192"),
                bytes_h(104, 100, 114, 108),   # 'hdrl'
                bytes_h(97, 118, 105, 104),    # 'avih'
                le32_h("56"),
                le32_h("100000"),              # usPerFrame (10 fps)
                le32_h("0"), le32_h("0"), le32_h("0"),
                le32_h("nf"),                  # totalFrames
                le32_h("0"),
                le32_h("1"),                   # streams
                le32_h("flen"),                # suggestedBufferSize
                le32_h("w"), le32_h("ht"),
                le32_h("0"), le32_h("0"), le32_h("0"), le32_h("0"),
                bytes_h(76, 73, 83, 84),       # 'LIST'
                le32_h("116"),
                bytes_h(115, 116, 114, 108),   # 'strl'
                bytes_h(115, 116, 114, 104),   # 'strh'
                le32_h("56"),
                bytes_h(118, 105, 100, 115),   # 'vids'
                bytes_h(68, 73, 66, 32),       # 'DIB '
                le32_h("0"), le32_h("0"), le32_h("0"),
                le32_h("1"),                   # scale
                le32_h("10"),                  # rate
                le32_h("0"),
                le32_h("nf"),                  # stream length
                le32_h("flen"),
                le32_h("0"), le32_h("0"),
                le16_h("0"), le16_h("0"),      # rcFrame left, top
                le16_h("w"), le16_h("ht"),     # rcFrame right, bottom
                bytes_h(115, 116, 114, 102),   # 'strf'
                le32_h("40"),
                le32_h("40"), le32_h("w"), le32_h("ht"),
                le16_h("1"), le16_h("24"),
                le32_h("0"),
                le32_h("flen"),
                le32_h("2835"), le32_h("2835"),
                le32_h("0"), le32_h("0"),
                bytes_h(76, 73, 83, 84),       # 'LIST'
                le32_h("4 + nf*(8 + flen)"),
                bytes_h(109, 111, 118, 105)])  # 'movi'
            + "])")

def avi_frame_bytes(fi="fi"):
    """Frame fi's pixel bytes: `fill` (= tb) cycled starting at offset
    fi, zeros when the text is empty — MediaSynth.avi's fill rule."""
    return (f"[CASE WHEN dlen = 0 THEN 0::HUGEINT"
            f" ELSE tb[(({fi} + j) % dlen) + 1] END for j in range(flen)]")

def avi_frames():
    """All movi child chunks: '00db' + le32(flen) + frame bytes, one
    per frame index."""
    return ("flatten([flatten(["
            + bytes_h(48, 48, 100, 98)   # '00db'
            + ", " + le32_h("flen")
            + ", " + avi_frame_bytes("fi")
            + "]) for fi in range(nf)])")


def gen_mm_decode():
    """Twin of Multimodal.decode over mediaFromText(documents), which
    now synthesizes REAL formats: the oracle rebuilds the exact BMP
    (24bpp, hash-derived dims <= 64, pixel area = cycled UTF-8 text
    bytes) and WAV (PCM 8-bit, hash-derived 1-2 channels, data = text
    bytes) byte streams in HUGEINT lists, FNV-folds them for the
    checksum, and reads dims/channels the way the header parser does.
    Video is a real minimal AVI (RIFF hdrl/movi, 24bpp DIB frames,
    hash-derived dims <= 16 and 1-4 frames of cycled text bytes)."""
    cs_basis = "1469598103934665603::HUGEINT"
    # --- image branch ---
    w = let(to_bigint(hash64("text")), lambda h:
            f"CAST((({h} % 64) + 64) % 64 + 1 AS INT)")
    ht = let(to_bigint(hash64("text || '|h'")), lambda h:
             f"CAST((({h} % 64) + 64) % 64 + 1 AS INT)")
    bmp_header = ("flatten(["
                  + ", ".join([
                      bytes_h(66, 77),            # 'B','M'
                      le32_h("54 + ht*stride"),    # file size
                      bytes_h(0, 0, 0, 0),        # reserved
                      le32_h("54"),                # pixel data offset
                      le32_h("40"),                # BITMAPINFOHEADER size
                      le32_h("w"), le32_h("ht"),
                      le16_h("1"), le16_h("24"),   # planes, bpp
                      le32_h("0"),                 # compression
                      le32_h("ht*stride"),         # image size
                      le32_h("2835"), le32_h("2835"),
                      le32_h("0"), le32_h("0")])
                  + "])")
    pixels = ("[CASE WHEN len(tb) = 0 THEN 0::HUGEINT"
              " ELSE tb[(i % len(tb)) + 1] END for i in range(ht*stride)]")
    img_cs = to_bigint(fnv1a_over(f"list_concat({bmp_header}, {pixels})",
                                  basis=cs_basis))
    # --- audio branch ---
    ch = let(to_bigint(hash64("text || '|c'")), lambda h:
             f"CAST((({h} % 2) + 2) % 2 + 1 AS INT)")
    wav_header = ("flatten(["
                  + ", ".join([
                      bytes_h(82, 73, 70, 70),     # 'RIFF'
                      le32_h("36 + dlen"),
                      bytes_h(87, 65, 86, 69),     # 'WAVE'
                      bytes_h(102, 109, 116, 32),  # 'fmt '
                      le32_h("16"), le16_h("1"), le16_h("ch"),
                      le32_h("8000"), le32_h("8000*ch"),
                      le16_h("ch"), le16_h("8"),
                      bytes_h(100, 97, 116, 97),   # 'data'
                      le32_h("dlen")])
                  + "])")
    wav_cs = to_bigint(fnv1a_over(f"list_concat({wav_header}, tb)",
                                  basis=cs_basis))
    # --- video branch: real AVI (MediaSynth.avi fixed layout) ---
    vw = let(to_bigint(hash64("text")), lambda h:
             f"CAST((({h} % 16) + 16) % 16 + 1 AS INT)")
    vh = let(to_bigint(hash64("text || '|h'")), lambda h:
             f"CAST((({h} % 16) + 16) % 16 + 1 AS INT)")
    vnf = let(to_bigint(hash64("text || '|f'")), lambda h:
              f"CAST((({h} % 4) + 4) % 4 + 1 AS INT)")
    avi_cs = to_bigint(fnv1a_over(
        f"list_concat({avi_header()}, {avi_frames()})", basis=cs_basis))
    return f"""WITH src AS (
  SELECT doc_id, text, {utf8_bytes('text')} AS tb FROM documents
),
img AS (
  SELECT doc_id, tb, w, ht, ((3*w + 3) // 4) * 4 AS stride
  FROM (SELECT doc_id, tb, {w} AS w, {ht} AS ht FROM src WHERE doc_id % 3 = 0)
),
img_out AS (
  SELECT doc_id AS media_id, 'image' AS kind,
    CAST(54 + ht*stride AS INT) AS n_bytes,
    w AS width, ht AS height, CAST(3 AS INT) AS channels,
    {img_cs} AS checksum, CAST(1 AS INT) AS valid
  FROM img
),
aud AS (
  SELECT doc_id, tb, ch, len(tb) AS dlen
  FROM (SELECT doc_id, tb, {ch} AS ch FROM src WHERE doc_id % 3 = 1)
),
aud_out AS (
  SELECT doc_id AS media_id, 'audio' AS kind,
    CAST(44 + dlen AS INT) AS n_bytes,
    CAST(dlen // ch AS INT) AS width, CAST(1 AS INT) AS height,
    ch AS channels, {wav_cs} AS checksum, CAST(1 AS INT) AS valid
  FROM aud
),
vid AS (
  SELECT doc_id, tb, len(tb) AS dlen, w, ht, nf,
         ((3*w + 3) // 4) * 4 AS stride,
         ht * (((3*w + 3) // 4) * 4) AS flen
  FROM (SELECT doc_id, tb, {vw} AS w, {vh} AS ht, {vnf} AS nf
        FROM src WHERE doc_id % 3 = 2)
),
vid_out AS (
  SELECT doc_id AS media_id, 'video' AS kind,
    CAST(224 + nf * (8 + flen) AS INT) AS n_bytes,
    w AS width, ht AS height, CAST(3 AS INT) AS channels,
    {avi_cs} AS checksum, CAST(1 AS INT) AS valid
  FROM vid
)
SELECT * FROM (
  SELECT * FROM img_out UNION ALL SELECT * FROM aud_out
  UNION ALL SELECT * FROM vid_out)
ORDER BY media_id"""


def gen_mm_hash64_text():
    """Signed-BIGINT hash64(text) SQL snippet (for the mm_media_meta
    oracle assembled in SparkEntry)."""
    return to_bigint(hash64("text"))

def gen_mm_hash64_text_h():
    return to_bigint(hash64("text || '|h'"))

def gen_mm_hash64_text_f():
    return to_bigint(hash64("text || '|f'"))


def gen_mm_frame_sample():
    """Twin of Multimodal.frameSample over the REAL AVI video rows
    (doc_id%3=2): one row per movi '00db' frame, offset_ms from the
    stream clock (scale=1/rate=10 -> 100 ms/frame), frame_checksum =
    FNV over the frame's actual pixel bytes (tb cycled from offset
    fi, MediaSynth.avi's fill rule)."""
    vw = let(to_bigint(hash64("text")), lambda h:
             f"CAST((({h} % 16) + 16) % 16 + 1 AS INT)")
    vh = let(to_bigint(hash64("text || '|h'")), lambda h:
             f"CAST((({h} % 16) + 16) % 16 + 1 AS INT)")
    vnf = let(to_bigint(hash64("text || '|f'")), lambda h:
              f"CAST((({h} % 4) + 4) % 4 + 1 AS INT)")
    frame_cs = to_bigint(fnv1a_over(avi_frame_bytes("fi"),
                                    basis="1469598103934665603::HUGEINT"))
    return f"""WITH vids AS (
  SELECT doc_id, tb, len(tb) AS dlen, w, ht, nf,
         ht * (((3*w + 3) // 4) * 4) AS flen
  FROM (SELECT doc_id, {utf8_bytes('text')} AS tb,
          {vw} AS w, {vh} AS ht, {vnf} AS nf
        FROM documents WHERE doc_id % 3 = 2)
),
frames AS (
  SELECT doc_id, CAST(fi AS INT) AS frame_idx,
         CAST(fi * 100 AS INT) AS offset_ms, {frame_cs} AS frame_checksum
  FROM (SELECT doc_id, tb, dlen, flen, unnest(range(nf)) AS fi FROM vids)
)
SELECT doc_id AS media_id, frame_idx, offset_ms, frame_checksum
FROM frames ORDER BY media_id, frame_idx"""


def gen_sketch_kmv():
    """Twin of Sketches.kmvDistinct (k=64) over documents.text: the
    64 smallest DISTINCT signed hash64 values (SQL's ORDER BY/LIMIT —
    the exhaustive twin of the Spark side's bottom-k UDAF), then the
    classic KMV estimator (k-1) * 2^64 / (kth + 2^63) in DOUBLE with
    the identical literal constants and operation order."""
    return f"""WITH hs AS (
  SELECT DISTINCT {to_bigint(hash64('text'))} AS h FROM documents
),
mins AS (SELECT h FROM hs ORDER BY h ASC LIMIT 64),
agg AS (SELECT count(*) AS k_used, max(h) AS kth FROM mins)
SELECT 64 AS k, CAST(k_used AS INT) AS k_used, kth AS kth_hash,
  CASE WHEN k_used < 64 THEN floor(CAST(k_used AS DOUBLE) * 100 + 0.5) / 100
       ELSE floor((CAST(63 AS DOUBLE) * 1.8446744073709552e19)
                  / (CAST(kth AS DOUBLE) + 9.223372036854776e18) * 100 + 0.5) / 100
  END AS est_distinct
FROM agg"""


def gen_sketch_hll():
    """Twin of Sketches.hllRegisters + hllEstimate (b=6, m=64) over
    documents.text: register = low 6 hash bits, rho = leading zeros
    of the remaining 58-bit word + 1 via an exact integer bit-length
    CASE ladder (the Spark side uses length(bin(w)) — also exact; no
    log2 floats on either engine), harmonic sum kept exact as
    sum(2^(59-rho)) in HUGEINT, ONE double division at the end."""
    # bitlen(w) for w < 2^58 as a descending CASE ladder
    ladder = " ".join(f"WHEN w >= {1 << (bl - 1)}::HUGEINT THEN {bl}"
                      for bl in range(58, 0, -1))
    return f"""WITH hs AS (
  SELECT {hash64('text')} AS h FROM documents
),
reg AS (
  SELECT CAST(h & 63::HUGEINT AS BIGINT) AS register,
         59 - (CASE {ladder} ELSE 0 END) AS rho
  FROM (SELECT h, h >> 6 AS w FROM hs)
),
regs AS (SELECT register, max(rho) AS max_rho FROM reg GROUP BY register),
agg AS (
  SELECT count(*) AS n_nonempty,
         sum(1::HUGEINT << (59 - max_rho)) AS s_occ
  FROM regs
)
SELECT 6 AS b, 64 AS m, n_nonempty,
  floor(0.709::DOUBLE * 64.0 * 64.0 * 5.76460752303423488e17
        / CAST(s_occ + (64 - n_nonempty)::HUGEINT * 576460752303423488::HUGEINT AS DOUBLE)
        * 100 + 0.5) / 100 AS est_hll
FROM agg"""


def gen_sketch_countmin():
    """Twin of Sketches.countMinTable + countMinEstimate (d=4,
    wBits=12) over documents.text token occurrences, probed with the
    exact top-10 tokens: cell positions are disjoint 12-bit slices of
    the single hash64, every cell count recomputed exactly, estimate =
    min over the 4 addressed cells."""
    return f"""WITH tok AS (
  SELECT unnest({toks('text')}) AS token FROM documents
),
th AS (
  SELECT token, {hash64('token')} AS h FROM (SELECT DISTINCT token FROM tok)
),
occ AS (SELECT t.token, th.h FROM tok t JOIN th USING (token)),
cells AS (
  SELECT j, CAST((h >> (12*j)) & 4095::HUGEINT AS BIGINT) AS pos,
         count(*) AS cnt
  FROM occ, range(4) r(j) GROUP BY 1, 2
),
exact AS (SELECT token, count(*) AS exact_n FROM tok GROUP BY token),
probes AS (SELECT token, exact_n FROM exact ORDER BY exact_n DESC, token LIMIT 10)
SELECT p.token, p.exact_n, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
FROM probes p JOIN th ON th.token = p.token
CROSS JOIN range(4) r(j)
LEFT JOIN cells c ON c.j = r.j
  AND c.pos = CAST((th.h >> (12*r.j)) & 4095::HUGEINT AS BIGINT)
GROUP BY p.token, p.exact_n
ORDER BY p.token"""


def gen_decontam_bloom():
    """Twin of Decontaminate.bloomReport (n=3, mBits=16, k=3) on the
    decontam_ngram corpus/bench split: the filter is the distinct set
    of 16-bit positions (3 disjoint hash64 slices) over the bench
    shingle set; a corpus shingle bloom-hits iff all 3 of its positions
    are set. Exact hits recomputed alongside so the false-positive
    overshoot is part of the pinned output."""
    return f"""WITH norm AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, CASE WHEN len(toks) >= 3
    THEN list_distinct([array_to_string(toks[i+1:i+3], ' ') for i in range(len(toks)-2)])
    ELSE [] END AS sh
  FROM norm
),
bench_sh AS (SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE doc_id % 37 = 0),
corpus AS (
  SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS shingle
  FROM sh WHERE doc_id % 37 <> 0
),
allsh AS (SELECT DISTINCT shingle FROM
  (SELECT shingle FROM bench_sh UNION ALL SELECT shingle FROM corpus)),
hs AS (SELECT shingle, {hash64('shingle')} AS h FROM allsh),
bits AS (
  SELECT DISTINCT CAST((h >> (16*j)) & 65535::HUGEINT AS BIGINT) AS bit
  FROM bench_sh JOIN hs USING (shingle), range(3) r(j)
),
probe AS (
  SELECT c.doc_id, c.n_shingles, c.shingle, count(*) AS n_set
  FROM corpus c JOIN hs USING (shingle)
  CROSS JOIN range(3) r(j)
  JOIN bits ON bits.bit = CAST((hs.h >> (16*r.j)) & 65535::HUGEINT AS BIGINT)
  GROUP BY 1, 2, 3
),
bloom AS (SELECT doc_id, n_shingles, count(*) AS n_bloom_hits
          FROM probe WHERE n_set = 3 GROUP BY 1, 2),
exact AS (SELECT doc_id, count(*) AS n_exact_hits
          FROM corpus JOIN bench_sh USING (shingle) GROUP BY doc_id)
SELECT b.doc_id, b.n_shingles, b.n_bloom_hits,
  coalesce(e.n_exact_hits, 0) AS n_exact_hits
FROM bloom b LEFT JOIN exact e USING (doc_id)
ORDER BY doc_id"""


def gen_text_dup_ngrams_cms():
    """Twin of TextAnalysis.dupNgramFractionCms (n=3, threshold=1,
    d=4, wBits=12): per-doc DISTINCT 3-gram shingles; the exact
    document-frequency dup flag beside a Count-Min estimate of the
    same df (cells counted over all per-doc-distinct shingle
    occurrences, est = min over the 4 addressed 12-bit cells — est >=
    exact always). Fractions floor-rounded to 4dp."""
    return f"""WITH norm AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, CASE WHEN len(toks) >= 3
    THEN list_distinct([array_to_string(toks[i+1:i+3], ' ') for i in range(len(toks)-2)])
    ELSE [] END AS sh
  FROM norm
),
occ AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
hs AS (SELECT shingle, {hash64('shingle')} AS h
       FROM (SELECT DISTINCT shingle FROM occ)),
cells AS (
  SELECT j, CAST((h >> (12*j)) & 4095::HUGEINT AS BIGINT) AS pos, count(*) AS cnt
  FROM occ JOIN hs USING (shingle), range(4) r(j) GROUP BY 1, 2
),
freq AS (SELECT shingle, count(*) AS df FROM occ GROUP BY shingle),
est AS (
  SELECT hs.shingle, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_df
  FROM hs CROSS JOIN range(4) r(j)
  LEFT JOIN cells c ON c.j = r.j
    AND c.pos = CAST((hs.h >> (12*r.j)) & 4095::HUGEINT AS BIGINT)
  GROUP BY hs.shingle
)
SELECT o.doc_id, count(*) AS n_ngrams,
  CAST(sum(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_exact,
  CAST(sum(CASE WHEN e.cms_df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_cms,
  floor(CAST(sum(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*) * 1e4 + 0.5) / 1e4 AS dup_fraction_exact,
  floor(CAST(sum(CASE WHEN e.cms_df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*) * 1e4 + 0.5) / 1e4 AS dup_fraction_cms
FROM occ o JOIN freq f USING (shingle) JOIN est e USING (shingle)
GROUP BY o.doc_id ORDER BY doc_id"""


def gen_hash64_expr():
    """Parameterizable hash64 snippet: callers (SparkEntry oracle
    assembly) substitute the literal token __EXPR__ with any VARCHAR
    SQL expression. Result is the UNSIGNED HUGEINT hash in [0, 2^64);
    wrap in the to-signed CASE when ORDER must match the JVM's signed
    Long order."""
    return hash64('__EXPR__')


ORACLES = {
    "dedup_simhash": gen_dedup_simhash,
    "dedup_minhash_lsh": gen_dedup_minhash_lsh,
    "dedup_lsh_verified": gen_dedup_lsh_verified,
    "ann_lsh_topk": gen_ann_lsh_topk,
    "ann_ivf_topk": gen_ann_ivf_topk,
    "mm_decode": gen_mm_decode,
    "mm_frame_sample": gen_mm_frame_sample,
    "sketch_kmv_distinct": gen_sketch_kmv,
    "sketch_hll_distinct": gen_sketch_hll,
    "sketch_countmin_freq": gen_sketch_countmin,
    "decontam_bloom": gen_decontam_bloom,
    "text_dup_ngrams_cms": gen_text_dup_ngrams_cms,
    # SQL snippets (not standalone oracles) consumed by oracle SQL
    # assembled in SparkEntry:
    "mm_hash64_text": gen_mm_hash64_text,
    "mm_hash64_text_h": gen_mm_hash64_text_h,
    "mm_hash64_text_f": gen_mm_hash64_text_f,
    "hash64_expr": gen_hash64_expr,
}

SCALA_HEADER = """package graft

/** DuckDB oracle SQL for the sketch / ANN / multimodal catalog
  * queries — GENERATED by tools/gen_sketch_oracles.py (regenerate
  * there; do not hand-edit). Each oracle recomputes graft\'s native
  * hashing (graft.functions.Hashing: FNV-1a 64 + splitmix64) in pure
  * DuckDB HUGEINT arithmetic and implements the NAIVE all-pairs /
  * exhaustive algorithm, independently cross-checking the banded,
  * blocked, or inverted-list distributed plan on the Spark side.
  * Verified bit-exact against the Spark outputs at sf0.01.
  */
object SketchOracles {
"""

def to_scala(out):
    parts = [SCALA_HEADER.replace("\\'", "'")]
    for name, sql in out.items():
        assert '"""' not in sql and '$' not in sql, name
        parts.append(f'  val {name}: String =\n"""{sql}"""\n')
    parts.append("}\n")
    return "\n".join(parts)

if __name__ == "__main__":
    out = {name: fn() for name, fn in ORACLES.items()}
    dest = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"
    if dest.endswith(".scala"):
        with open(dest, "w") as f:
            f.write(to_scala(out))
    else:
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)
    for k, v in out.items():
        print(f"{k}: {len(v)} chars", file=sys.stderr)
