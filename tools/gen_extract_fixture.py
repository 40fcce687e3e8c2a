#!/usr/bin/env python3
"""Freeze the expected q_extract_pipeline output for the deterministic
PageGen corpus into a parquet fixture the DuckDB oracle can SELECT.

Provenance, per row kind:
  - html/other rows ("src"="cpython"): text_md5 and n_chars are computed
    HERE from the CPython goldens (tools/gen_page_goldens.py — the
    reference semantics in their native runtime), INDEPENDENTLY of the
    Scala engine. The engine dump is only cross-checked against them:
    any mismatch aborts the freeze, so a drifting kernel can never be
    frozen in.
  - pdf rows ("src"="engine"): the PDF text semantics are this engine's
    own (the reference shells out to a pdftotext binary absent here;
    SURVEY.md §7.4) — md5/n_chars are regression pins of the engine
    output, independently covered by PdfSpec's byte goldens.
  - n_spans is an engine pin for all rows (the golden generator does not
    compute main-content spans; spans are covered by GoldenCorpusSpec /
    MainContentSpec assertions).

Usage:
  gen_extract_fixture.py golden_2k.jsonl <verify_out>/q_extract_pipeline \
      fixtures/expected/extract_pipeline.parquet

The corpus_tag column pins the generator identity (rows + seed); the
oracle WHERE-filters on it so a PageGen change can never silently match
a stale fixture.
"""
import base64, glob, hashlib, json, sys
import pyarrow as pa
import pyarrow.parquet as pq

CORPUS_TAG = "pagegen-2000-42"

def main():
    golden_path, engine_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]

    goldens = {}
    with open(golden_path) as f:
        for line in f:
            g = json.loads(line)
            goldens[g["url"]] = g

    engine = {}
    for fp in sorted(glob.glob(f"{engine_dir}/*.parquet")):
        t = pq.read_table(fp)
        for row in t.to_pylist():
            engine[row["url"]] = row

    if set(goldens) != set(engine):
        sys.exit(f"url set mismatch: {len(goldens)} goldens vs {len(engine)} engine rows")

    rows = []
    n_cpython = n_engine = 0
    for url in sorted(goldens):
        g, e = goldens[url], engine[url]
        kind = g["kind"]
        if e["doc_type"] != kind:
            sys.exit(f"doc_type drift at {url}: engine {e['doc_type']} vs golden {kind}")
        if kind != "pdf":
            text = (base64.b64decode(g["text_b64"]).decode("utf-8")
                    if g["text_b64"] is not None else None)
            md5 = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            n_chars = len(text) if text is not None else 0
            if e["text_md5"] != md5:
                sys.exit(f"ENGINE/CPython md5 drift at {url} — refusing to freeze")
            if e["n_chars"] != n_chars:
                sys.exit(f"ENGINE/CPython n_chars drift at {url}: {e['n_chars']} vs {n_chars}")
            src = "cpython"
            n_cpython += 1
        else:
            md5, n_chars = e["text_md5"], e["n_chars"]
            src = "engine"
            n_engine += 1
        rows.append({
            "corpus_tag": CORPUS_TAG, "url": url, "doc_type": kind,
            "text_md5": md5, "n_chars": int(n_chars),
            "n_spans": int(e["n_spans"]), "src": src,
        })

    schema = pa.schema([
        ("corpus_tag", pa.string()), ("url", pa.string()),
        ("doc_type", pa.string()), ("text_md5", pa.string()),
        ("n_chars", pa.int64()), ("n_spans", pa.int64()), ("src", pa.string()),
    ])
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), out_path)
    print(f"froze {len(rows)} rows ({n_cpython} cpython-verified, "
          f"{n_engine} engine-pinned pdf) -> {out_path}")

main()
