#!/usr/bin/env python3
"""Independent end-to-end oracle for q_corpus_build — the CHAINED corpus
pipeline (extract -> Gopher keep-gate -> PII scrub -> minhash collapse ->
per-host rollup) mirrored stage by stage in Python from the documented
semantics (NOT via the Scala code), with the minhash collapse brute-forced
all-pairs via gen_expected.py's independent signature implementation.

Chain being mirrored (SparkEntry.q_corpus_build):
  corpus  = documents UNION mutated copies (doc_id%20==0 -> +1000000,
            text + " tiny appended suffix")
  page    = corpus text + PII decoration by doc_id%4 (email/IPs/phone/none)
  extract = ExtractKernel over "doc://id" text payloads — proven verbatim
            for printable text (q_extract_text), so extract(page) == page
  gate    = QualityFilters.gopherKeep: words of lower(text) via
            [^ \\t\\n\\x0B\\f\\r]+; 50 <= n_words <= 100000;
            3*n <= sum(len(w)) <= 10*n; alpha words *5 >= n*4;
            symbol words *10 <= n; >= 2 distinct stopwords
  scrub   = PiiScrub.redact: email -> <EMAIL>, then IPv4 -> <IP>, then
            phone -> <PHONE> (progressive)
  collapse= minhash (64 perms/16 bands/shingle 5/seed 42) pairs at
            est >= 0.6 over clean_text, union-find, keepers = component min
  rollup  = per synthHost(doc_id): n_docs, sum(len(clean_text))

Writes fixtures/expected/corpus_build.parquet tagged with the same
documents-content probe the other frozen fixtures use.

Usage: gen_corpus_build.py [sfdir ...]  (defaults to sf0.001 sf0.01 sf0.1)
"""
import os
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_expected import signature, minhash_pairs, union_find_keepers  # noqa: E402

EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
IPV4_RE = re.compile(r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b")
PHONE_RE = re.compile(r"\+[0-9]{7,15}")
WORD_RE = re.compile(r"[^ \t\n\x0b\f\r]+")
ALPHA_RE = re.compile(r"[a-z]")
SYM_RE = re.compile(r"^(#|\.\.\.)")
STOPWORDS = {"the", "and", "of", "to", "in", "is", "that", "for", "it", "on"}

DECOS = {
    0: " Contact john.doe+spam@mail-server.example.co.uk now.",
    1: " Server at 192.168.0.1 and 10.20.30.40 responded.",
    2: " Call +14155552671 today.",
    3: "",
}


def gopher_keep(text):
    w = WORD_RE.findall(text.lower())
    n = len(w)
    if not (50 <= n <= 100000):
        return False
    chars = sum(len(x) for x in w)
    if not (3 * n <= chars <= 10 * n):
        return False
    alpha = sum(1 for x in w if ALPHA_RE.search(x))
    if alpha * 5 < n * 4:
        return False
    sym = sum(1 for x in w if SYM_RE.search(x))
    if sym * 10 > n:
        return False
    return len(set(w) & STOPWORDS) >= 2


def redact(text):
    t = EMAIL_RE.sub("<EMAIL>", text)
    t = IPV4_RE.sub("<IP>", t)
    return PHONE_RE.sub("<PHONE>", t)


def synth_host(doc_id):
    if doc_id % 2 == 0:
        return "big.news.example.com"
    tail = "blog.example.org" if doc_id % 3 == 0 else "shop.example.net"
    return f"h{doc_id % 97}.{tail}"


def main():
    sf_dirs = sys.argv[1:] or [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "fixtures", "expected")
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for sf in sf_dirs:
        t = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"])
        doc_ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        tag = f"{len(doc_ids)}-{sum(len(tx) for tx in texts)}"

        ids = list(doc_ids)
        corpus = list(texts)
        for i, d in enumerate(doc_ids):
            if d % 20 == 0:
                ids.append(d + 1000000)
                corpus.append(texts[i] + " tiny appended suffix")
        # page text (boilerplate sentence + planted PII), kernel-verbatim
        # extraction, gate, scrub
        kept_ids, clean = [], []
        for d, tx in zip(ids, corpus):
            page = tx + " It is on the record, and that is that." + DECOS[d % 4]
            if gopher_keep(page):
                kept_ids.append(d)
                clean.append(redact(page))
        print(f"[{sf}] tag={tag} gated {len(kept_ids)}/{len(ids)}")

        sigs = [signature(tx) for tx in clean]
        pairs = minhash_pairs(kept_ids, sigs, 0.6)
        keepers = set(union_find_keepers(kept_ids, pairs))
        print(f"  pairs={len(pairs)} keepers={len(keepers)}")

        agg = {}
        for d, tx in zip(kept_ids, clean):
            if d in keepers:
                h = synth_host(d)
                n, c = agg.get(h, (0, 0))
                agg[h] = (n + 1, c + len(tx))
        for h in sorted(agg):
            rows.append((tag, h, agg[h][0], agg[h][1]))

    pq.write_table(pa.table({
        "corpus_tag": pa.array([r[0] for r in rows], pa.string()),
        "host": pa.array([r[1] for r in rows], pa.string()),
        "n_docs": pa.array([r[2] for r in rows], pa.int64()),
        "sum_chars": pa.array([r[3] for r in rows], pa.int64())}),
        os.path.join(out_dir, "corpus_build.parquet"))
    print(f"wrote {os.path.join(out_dir, 'corpus_build.parquet')} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
