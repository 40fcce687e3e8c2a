#!/usr/bin/env python3
"""Golden oracle for the pages corpus: given the dumped payload bytes,
compute the EXPECTED extracted_text per the reference semantics
(/root/reference/src/processor.py) in CPython, where those semantics are
native. PDF payloads are marked kind=pdf with no text expectation here
(the PDF parser semantics are this engine's own, frozen by PdfSpec +
self-consistency); html/text/junk payloads get byte-exact expectations.

Usage: gen_page_goldens.py payloads.jsonl golden_out.jsonl"""
import base64, io, json, sys

FALLBACK_MAX = 204800
FALLBACK_MIN_PRINTABLE = 0.99

def sniff(b: bytes) -> str:
    # mirrors graft.kernel.ExtractKernel.sniff
    if b[:5] == b'%PDF-': return 'pdf'
    limit = min(len(b), 1024)
    openers = [b'<!doctype', b'<html', b'<head', b'<body', b'<?xml']
    low = b[:limit].lower()
    i = 0
    while i < limit:
        if b[i:i+1] == b'<' and i + 1 < limit:
            if any(low[i:].startswith(o) for o in openers): return 'html'
            nxt = b[i+1:i+2]
            leading_ws = all(c in b' \t\r\n\f' for c in b[:i])
            if leading_ws and (nxt.isalpha() or nxt in (b'!', b'/')): return 'html'
        i += 1
    return 'other'

def extract_text_from_file(data: bytes, cap=None):
    # text-mode open() semantics: universal-newline translation (reference
    # src/processor.py:656,659), cap counts translated chars
    def _read(enc):
        f = io.TextIOWrapper(io.BytesIO(data), encoding=enc)
        return f.read() if cap is None else f.read(cap)
    try:
        text = _read('utf-8')
    except UnicodeDecodeError:
        text = _read('latin-1')
    return text if text.strip() else None

def extract_text_fallback(data: bytes, cap=None):
    if len(data) > FALLBACK_MAX: return None
    read_n = len(data) if cap is None else min(len(data), cap)
    raw = data[:read_n]
    if b'\x00' in raw: return None
    try: text = raw.decode('utf-8')
    except UnicodeDecodeError: text = raw.decode('latin-1')
    if not text.strip(): return None
    printable = sum(1 for c in text if c.isprintable() or c in '\n\r\t')
    if printable / len(text) < FALLBACK_MIN_PRINTABLE: return None
    return text.replace('\x00', '')

def main():
    src, dst = sys.argv[1], sys.argv[2]
    n_html = n_other = n_pdf = 0
    with open(src) as f, open(dst, 'w') as out:
        for line in f:
            rec = json.loads(line)
            data = base64.b64decode(rec['b64'])
            kind = sniff(data)
            if kind == 'pdf':
                golden = {'url': rec['url'], 'kind': 'pdf', 'text_b64': None}
                n_pdf += 1
            elif kind == 'html':
                t = extract_text_from_file(data)
                golden = {'url': rec['url'], 'kind': 'html',
                          'text_b64': base64.b64encode(t.encode('utf-8')).decode() if t is not None else None}
                n_html += 1
            else:
                t = extract_text_fallback(data)
                golden = {'url': rec['url'], 'kind': 'other',
                          'text_b64': base64.b64encode(t.encode('utf-8')).decode() if t is not None else None}
                n_other += 1
            out.write(json.dumps(golden) + '\n')
    print(f'html={n_html} other={n_other} pdf={n_pdf}')

main()
