#!/usr/bin/env python3
"""Independent brute-force oracle for the non-SQL-expressible dedup queries.

Reimplements (in Python/numpy, from the documented algorithm spec — NOT via
the Scala code paths) the deterministic kernels behind q_minhash_pairs,
q_simhash_pairs and q_dedup_collapse, computes the expected outputs by brute
force (full grouping / all-pairs, no LSH shortcuts where avoidable), and
freezes them as parquet fixtures under fixtures/expected/ tagged with the
documents-table row count, so the DuckDB oracle can SELECT the slice matching
whatever SF the driver verifies at:

    SELECT id_a, id_b FROM read_parquet('/root/repo/fixtures/expected/minhash_pairs.parquet')
    WHERE corpus_tag = (SELECT count(*) || '-' || sum(length(text)) FROM documents)
    ORDER BY id_a, id_b

(the tag is a content probe, not just a row count: the sf0.001 and sf0.01
documents tables both have 500 rows but different texts)

Spec being mirrored (graft.operators.Dedup):
  - normalize: drop leading/trailing whitespace (Java isWhitespace), collapse
    runs to one space, lowercase
  - shingle hash: FNV-1a (64-bit) over UTF-16 units of 5-char windows
  - minhash: 64 multiply-shift perms a*h+b, constants from splitmix64(42)
    (64 draws for a (|1), then 64 for b); per-position min under SIGNED
    64-bit comparison; texts shorter than the shingle hash the whole text
  - banding: 16 bands x 4 rows; bucket = the band's value tuple (the Scala
    side hashes the tuple with FNV — a 2^-64 collision we ignore); pairs
    within a bucket emit when estimated Jaccard (matching positions / 64)
    >= threshold; pair ids ordered ascending; de-duplicated across bands
  - simhash: FNV-1a per whitespace token of the normalized text, +/-1 votes
    per bit, bit set when votes > 0; empty text -> 0; pairs = ALL pairs with
    hamming distance <= 3 (computed all-pairs here; the Spark side's 4x16-bit
    pigeonhole blocking has provable recall 1 at maxHamming <= 3)
  - collapse: connected components (union-find) over the minhash pair set;
    keepers = corpus ids minus non-min members of each component

Usage: gen_expected.py [sfdir ...]   (defaults to sf0.001 sf0.01 sf0.1)
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MASK = (1 << 64) - 1
FNV_BASIS = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
JAVA_WS = {0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20}


def normalize(text):
    out = []
    pend = False
    for c in text:
        if ord(c) in JAVA_WS or (ord(c) > 0x7F and c.isspace()):
            pend = len(out) > 0
        else:
            if pend:
                out.append(' ')
            pend = False
            out.append(c.lower())
    return ''.join(out)


def fnv1a(s):
    h = FNV_BASIS
    for c in s:
        h = ((h ^ ord(c)) * FNV_PRIME) & MASK
    return h


def splitmix_stream(seed, n):
    x = seed
    out = []
    for _ in range(n):
        x = (x + 0x9E3779B97F4A7C15) & MASK
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
        out.append((z ^ (z >> 31)) & MASK)
    return out


NUM_PERMS, SHINGLE, SEED, BANDS, ROWS_PER_BAND = 64, 5, 42, 16, 4
_stream = splitmix_stream(SEED, 2 * NUM_PERMS)
PERM_A = np.array([v | 1 for v in _stream[:NUM_PERMS]], dtype=np.uint64)
PERM_B = np.array(_stream[NUM_PERMS:], dtype=np.uint64)
SIGN_FLIP = np.uint64(1 << 63)


def shingle_hashes(norm):
    """FNV-1a over every 5-char window, vectorized over window positions."""
    if len(norm) < SHINGLE:
        return np.array([fnv1a(norm)], dtype=np.uint64)
    codes = np.frombuffer(norm.encode('utf-16-le'), dtype=np.uint16).astype(np.uint64)
    n = len(norm) - SHINGLE + 1
    h = np.full(n, FNV_BASIS, dtype=np.uint64)
    prime = np.uint64(FNV_PRIME)
    for k in range(SHINGLE):
        h = (h ^ codes[k:k + n]) * prime  # uint64 wraps like Scala Long
    return h


def signature(text):
    hs = shingle_hashes(normalize(text))
    # v = a*h + b per (shingle, perm); min under SIGNED comparison
    v = hs[:, None] * PERM_A[None, :] + PERM_B[None, :]
    idx = np.argmin(v ^ SIGN_FLIP, axis=0)  # flip sign bit -> unsigned order == signed
    return v[idx, np.arange(NUM_PERMS)]


def simhash64(text):
    if text is None or text == '':
        return 0
    votes = np.zeros(64, dtype=np.int64)
    for tok in normalize(text).split(' '):
        if tok:
            h = fnv1a(tok)
            bits = np.array([(h >> b) & 1 for b in range(64)], dtype=np.int64)
            votes += 2 * bits - 1
    out = 0
    for b in range(64):
        if votes[b] > 0:
            out |= 1 << b
    return out


def minhash_pairs(ids, sigs, threshold, max_bucket=64):
    """Brute-force LSH: group by exact band tuple, emit est>=threshold pairs.
    Oversized buckets keep the max_bucket SMALLEST ids (the Spark side's
    deterministic row_number cap)."""
    sig_mat = np.stack(sigs)  # (n, 64) uint64
    buckets = {}
    for band in range(BANDS):
        sl = sig_mat[:, band * ROWS_PER_BAND:(band + 1) * ROWS_PER_BAND]
        for i in range(len(ids)):
            buckets.setdefault((band, sl[i].tobytes()), []).append(i)
    pairs = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        if len(members) > max_bucket:
            members = sorted(members, key=lambda i: ids[i])[:max_bucket]
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                if ids[i] == ids[j]:
                    continue
                est = np.count_nonzero(sig_mat[i] == sig_mat[j]) / NUM_PERMS
                if est >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    pairs.add((a, b))
    return sorted(pairs)


def simhash_pairs(ids, hashes, max_hamming):
    h = np.array(hashes, dtype=np.uint64)
    pairs = []
    for i in range(len(ids)):
        x = h[i + 1:] ^ h[i]
        # popcount via Wilkes-Wheeler-Gill
        v = x.copy()
        v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
        v = (v & np.uint64(0x3333333333333333)) + ((v >> np.uint64(2)) & np.uint64(0x3333333333333333))
        v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        pc = (v * np.uint64(0x0101010101010101)) >> np.uint64(56)
        for off in np.nonzero(pc <= max_hamming)[0]:
            j = i + 1 + int(off)
            a, b = sorted((ids[i], ids[j]))
            pairs.append((a, b, int(pc[off])))
    return sorted(set(pairs))


def hyperplanes(bits, dim, seed):
    """Similarity.hyperplanes: CLT-sum gaussians from splitmix64, f32 cast."""
    stream = splitmix_stream(seed, bits * dim * 4)
    units = [((v >> 11) * 1.1102230246251565e-16) - 0.5 for v in stream]
    planes = np.empty((bits, dim), dtype=np.float32)
    k = 0
    for b in range(bits):
        for d in range(dim):
            planes[b, d] = np.float32(units[k] + units[k + 1] + units[k + 2] + units[k + 3])
            k += 4
    return planes


def lsh_buckets(vecs_f32, planes):
    """Sign-LSH buckets with the Scala op order: per-dim f32 multiply then
    sequential f32 accumulation (bit-exact vs `s += vec(j) * p(j)`)."""
    n, dim = vecs_f32.shape
    out = np.zeros(n, dtype=np.int64)
    for b in range(planes.shape[0]):
        s = np.zeros(n, dtype=np.float32)
        for j in range(min(dim, planes.shape[1])):
            s = (s + vecs_f32[:, j] * planes[b, j]).astype(np.float32)
        out |= (s >= 0).astype(np.int64) << b
    return out


def seq_dot_f64(a_mat, b_vec):
    """aggregate(zip_with(a,b, double multiply), 0.0, +) — sequential left
    fold in float64, vectorized over rows."""
    acc = np.zeros(a_mat.shape[0], dtype=np.float64)
    for j in range(a_mat.shape[1]):
        acc = acc + a_mat[:, j].astype(np.float64) * np.float64(b_vec[j])
    return acc


def seq_norm_f64(mat):
    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for j in range(mat.shape[1]):
        x = mat[:, j].astype(np.float64)
        acc = acc + x * x
    return np.sqrt(acc)


def ann_lsh_topk(vec_ids, vecs_f32, k=10, bits=6, dim=64, seed=42, probes=3):
    """Similarity.lshTopK over the full corpus, queries = vec_id % 100 == 0."""
    planes = hyperplanes(bits, dim, seed)
    buckets = lsh_buckets(vecs_f32, planes)
    norms = seq_norm_f64(vecs_f32)
    rows = []
    qidx = [i for i, v in enumerate(vec_ids) if v % 100 == 0]
    for qi in qidx:
        qb = buckets[qi]
        probe_set = {qb} | {qb ^ (1 << p) for p in range(min(probes, bits))}
        cand = [i for i in range(len(vec_ids))
                if buckets[i] in probe_set and vec_ids[i] != vec_ids[qi]]
        if not cand:
            continue
        cm = vecs_f32[cand]
        # cosine(corpus, query): dot / (norm(corpus) * norm(query) + 1e-12)
        sims = seq_dot_f64(cm, vecs_f32[qi]) / (seq_norm_f64(cm) * norms[qi] + 1e-12)
        order = sorted(range(len(cand)), key=lambda i: (-sims[i], vec_ids[cand[i]]))
        for rank, i in enumerate(order[:k], start=1):
            rows.append((vec_ids[qi], vec_ids[cand[i]], rank))
    return rows


def nearest_centroids(v_f32, cents_f32, n):
    """Similarity.nearestCentroids: per-dim f32 product widened to f64
    accumulation (Scala: `dot += v(j) * p(j)` rounds the product to f32
    first), cosine score, ties broken by centroid index."""
    scores = []
    for c in range(cents_f32.shape[0]):
        p = cents_f32[c]
        m = min(len(p), len(v_f32))
        dot = nv = npp = np.float64(0.0)
        prods = (v_f32[:m] * p[:m]).astype(np.float64)
        vs = (v_f32[:m] * v_f32[:m]).astype(np.float64)
        ps = (p[:m] * p[:m]).astype(np.float64)
        for j in range(m):
            dot = dot + prods[j]
            nv = nv + vs[j]
            npp = npp + ps[j]
        scores.append((c, dot / (np.sqrt(nv) * np.sqrt(npp) + 1e-12)))
    scores.sort(key=lambda t: (-t[1], t[0]))
    return [c for c, _ in scores[:min(n, len(scores))]]


def train_centroids(sample_f32, nlist=16, iters=10):
    """Similarity.trainCentroids: strided init, f64 sums, f32 centroid cast."""
    n = sample_f32.shape[0]
    k = min(nlist, n)
    dim = sample_f32.shape[1]
    cents = np.stack([sample_f32[i * n // k] for i in range(k)]).astype(np.float32)
    for _ in range(iters):
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for v in sample_f32:
            c = nearest_centroids(v, cents, 1)[0]
            counts[c] += 1
            sums[c] += v.astype(np.float64)
        new = cents.copy()
        for c in range(k):
            if counts[c] > 0:
                new[c] = (sums[c] / counts[c]).astype(np.float32)
        cents = new
    return cents


def ann_ivf_topk(vec_ids, vecs_f32, k=10, nlist=16, nprobe=4, sample_cap=4096):
    """Similarity.ivfTopK: queries = vec_id % 100 == 0."""
    order = np.argsort(np.array(vec_ids), kind="stable")
    sample = vecs_f32[order[:sample_cap]]
    cents = train_centroids(sample, nlist)
    cells = np.array([nearest_centroids(v, cents, 1)[0] for v in vecs_f32])
    norms = seq_norm_f64(vecs_f32)
    rows = []
    for qi in [i for i, v in enumerate(vec_ids) if v % 100 == 0]:
        probed = set(nearest_centroids(vecs_f32[qi], cents, nprobe))
        cand = [i for i in range(len(vec_ids))
                if cells[i] in probed and vec_ids[i] != vec_ids[qi]]
        if not cand:
            continue
        cm = vecs_f32[cand]
        sims = seq_dot_f64(cm, vecs_f32[qi]) / (seq_norm_f64(cm) * norms[qi] + 1e-12)
        ordered = sorted(range(len(cand)), key=lambda i: (-sims[i], vec_ids[cand[i]]))
        for rank, i in enumerate(ordered[:k], start=1):
            rows.append((vec_ids[qi], vec_ids[cand[i]], rank))
    return rows


def union_find_keepers(corpus_ids, pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    min_of = {}
    for k in list(parent):
        r = find(k)
        min_of[r] = min(min_of.get(r, k), k)
    drops = {k for k in parent if min_of[find(k)] != k}
    return sorted(set(corpus_ids) - drops)


def main():
    sf_dirs = sys.argv[1:] or [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "fixtures", "expected")
    os.makedirs(out_dir, exist_ok=True)
    mh_rows, sh_rows, cc_rows, lsh_rows, ivf_rows = [], [], [], [], []
    for sf in sf_dirs:
        t = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"])
        doc_ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        tag = f"{len(doc_ids)}-{sum(len(tx) for tx in texts)}"
        print(f"[{sf}] tag={tag}")

        # ---- q_minhash_pairs / q_dedup_collapse corpus: %20 mutation ----
        ids = list(doc_ids)
        corpus = list(texts)
        for i, d in enumerate(doc_ids):
            if d % 20 == 0:
                ids.append(d + 1000000)
                corpus.append(texts[i] + " tiny appended suffix")
        sigs = [signature(tx) for tx in corpus]
        mh = minhash_pairs(ids, sigs, 0.6)
        print(f"  minhash pairs: {len(mh)}")
        mh_rows += [(tag, a, b) for a, b in mh]
        keep = union_find_keepers(ids, mh)
        print(f"  collapse keepers: {len(keep)}")
        cc_rows += [(tag, k) for k in keep]

        # ---- q_simhash_pairs corpus: %25 mutation ----
        ids2 = list(doc_ids)
        corpus2 = list(texts)
        for i, d in enumerate(doc_ids):
            if d % 25 == 0:
                ids2.append(d + 1000000)
                corpus2.append(texts[i] + " x")
        hashes = [simhash64(tx) for tx in corpus2]
        sh = simhash_pairs(ids2, hashes, 3)
        print(f"  simhash pairs: {len(sh)}")
        sh_rows += [(tag, a, b, h) for a, b, h in sh]

        # ---- q_ann_lsh: full corpus, queries = vec_id % 100 == 0 ----
        et = pq.read_table(os.path.join(sf, "embeddings.parquet"),
                           columns=["vec_id", "embedding"])
        vec_ids = et.column("vec_id").to_pylist()
        vecs = np.array(et.column("embedding").to_pylist(), dtype=np.float32)
        lsh = ann_lsh_topk(vec_ids, vecs)
        print(f"  ann_lsh rows: {len(lsh)}")
        lsh_rows += [(tag, q, v, r) for q, v, r in lsh]

        # ---- q_ann_ivf ----
        ivf = ann_ivf_topk(vec_ids, vecs)
        print(f"  ann_ivf rows: {len(ivf)}")
        ivf_rows += [(tag, q, v, r) for q, v, r in ivf]

    pq.write_table(pa.table({
        "corpus_tag": pa.array([r[0] for r in mh_rows], pa.string()),
        "id_a": pa.array([r[1] for r in mh_rows], pa.int64()),
        "id_b": pa.array([r[2] for r in mh_rows], pa.int64())}),
        os.path.join(out_dir, "minhash_pairs.parquet"))
    pq.write_table(pa.table({
        "corpus_tag": pa.array([r[0] for r in sh_rows], pa.string()),
        "id_a": pa.array([r[1] for r in sh_rows], pa.int64()),
        "id_b": pa.array([r[2] for r in sh_rows], pa.int64()),
        "hamming": pa.array([r[3] for r in sh_rows], pa.int32())}),
        os.path.join(out_dir, "simhash_pairs.parquet"))
    pq.write_table(pa.table({
        "corpus_tag": pa.array([r[0] for r in cc_rows], pa.string()),
        "doc_id": pa.array([r[1] for r in cc_rows], pa.int64())}),
        os.path.join(out_dir, "dedup_collapse.parquet"))
    pq.write_table(pa.table({
        "corpus_tag": pa.array([r[0] for r in lsh_rows], pa.string()),
        "query_id": pa.array([r[1] for r in lsh_rows], pa.int64()),
        "vec_id": pa.array([r[2] for r in lsh_rows], pa.int64()),
        "rank": pa.array([r[3] for r in lsh_rows], pa.int32())}),
        os.path.join(out_dir, "ann_lsh.parquet"))
    pq.write_table(pa.table({
        "corpus_tag": pa.array([r[0] for r in ivf_rows], pa.string()),
        "query_id": pa.array([r[1] for r in ivf_rows], pa.int64()),
        "vec_id": pa.array([r[2] for r in ivf_rows], pa.int64()),
        "rank": pa.array([r[3] for r in ivf_rows], pa.int32())}),
        os.path.join(out_dir, "ann_ivf.parquet"))
    print(f"wrote fixtures to {out_dir}")


if __name__ == "__main__":
    main()
