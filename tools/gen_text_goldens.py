#!/usr/bin/env python3
"""Golden generator for the text kernel: reimplements the reference's pure
text semantics (see /root/reference/src/processor.py, text_limits.py,
uploader.py, ocr_client.py, ocr_watcher.py) in Python -- where they are
native -- and freezes input/output pairs so the Scala kernel can be checked
for Python/JVM byte identity. Deterministic; run once, commit output."""
import base64, io, json, re, sys

FALLBACK_MAX = 204800
FALLBACK_MIN_PRINTABLE = 0.99

def truncate_text(s, cap):
    if cap is None or len(s) <= cap: return s
    return s[:cap]

def extract_text_from_file(data: bytes, cap):
    # Reference opens files in TEXT mode (src/processor.py:656,659):
    # universal-newline translation applies, and the cap counts translated
    # characters. io.TextIOWrapper reproduces open() exactly.
    def _read(enc):
        f = io.TextIOWrapper(io.BytesIO(data), encoding=enc)
        return f.read() if cap is None else f.read(cap)
    try:
        text = _read('utf-8')
    except UnicodeDecodeError:
        text = _read('latin-1')
    return text if text.strip() else None

def extract_text_fallback(data: bytes, cap):
    if len(data) > FALLBACK_MAX: return None
    read_n = len(data) if cap is None else min(len(data), cap)
    raw = data[:read_n]
    if b'\x00' in raw: return None
    try: text = raw.decode('utf-8')
    except UnicodeDecodeError: text = raw.decode('latin-1')
    if not text.strip(): return None
    printable = sum(1 for c in text if c.isprintable() or c in '\n\r\t')
    if printable/len(text) < FALLBACK_MIN_PRINTABLE: return None
    return text.replace('\x00','')

def sanitize_text(text, cap=None):
    if not text: return text
    text = truncate_text(text, cap)
    text = text.replace('\x00','')
    return re.sub(r'[^\x20-\x7E\n\r\t -￿]', '', text)

def printable_ratio(text):
    if not text: return 0.0
    return sum(1 for c in text if c.isprintable() or c in '\n\r\t')/len(text)

def should_use_ocr(embedded_text, ocr_text, ocr_quality):
    emb_len = len(embedded_text.strip()) if embedded_text else 0
    ocr_len = len(ocr_text.strip())
    if emb_len < 10:
        return (True,'no_embedded_ocr_found_text') if ocr_len > 50 else (False,'both_empty')
    if ocr_len > emb_len*2 and ocr_len > 200: return (True,'ocr_found_more')
    if ocr_len > 100 and ocr_quality > 0.4:
        if emb_len < 500 and ocr_quality > 0.5: return (True,'ocr_better_for_short_embedded')
    return (False,'embedded_ok')

def get_final_text(embedded_text, ocr_text, reason):
    embedded = embedded_text.strip() if embedded_text else ''
    ocr = ocr_text.strip() if ocr_text is not None else ''
    if reason == 'both_empty': return ''
    if reason == 'embedded_ok': return embedded
    if reason in ('ocr_found_more','ocr_better_for_short_embedded','no_embedded_ocr_found_text'):
        if embedded and len(embedded) > 50 and reason != 'no_embedded_ocr_found_text':
            return f"{ocr}\n\n--- embedded text ---\n\n{embedded}"
        return ocr
    return embedded if embedded else ocr

def compute_quality(text, wordlist):
    if not wordlist or not text: return 0.5
    words = text.lower().split()
    checkable = [w.strip('.,;:!?()[]{}"\'-') for w in words if len(w) >= 3]
    checkable = [w for w in checkable if w.isalpha()]
    if len(checkable) < 3: return 0.5
    return sum(1 for w in checkable if w in wordlist)/len(checkable)

# --- corpus of adversarial inputs ------------------------------------
emoji = '\U0001F600'  # astral
byte_cases = [
    b'hello world',
    'café über straße'.encode('utf-8'),
    'café über'.encode('latin-1'),           # broken as utf-8
    b'\xff\xfe invalid utf8 \xc3',
    ('emoji ' + emoji + ' tail').encode('utf-8'),
    b'   \t\n  ',                                       # blank
    '  '.encode('utf-8'),                     # NBSP-only (py-blank!)
    b'line1\nline2\r\nline3\ttab',
    b'nul\x00inside',
    ('a'*9 + emoji + 'b'*20).encode('utf-8'),          # astral before cap
    bytes(range(1,32))*3,                               # control soup
    ('ok text ' * 100 + '\x01\x02').encode('utf-8'),   # ~0.997 printable
    ('x '*50 + '\x01'*3).encode('utf-8'),              # below 0.99
    '  ​­zero-width'.encode('utf-8'),  # Zl/Zp/Cf
    b'%PDF-1.4 fake',
    # universal-newline cases (text-mode translation, ADVICE r1)
    b'crlf line1\r\nline2\r\nend\r',
    b'lone\rcarriage\rreturns',
    b'mixed\r\nnewlines\rand\nnl',
    b'umlaut \xe4\r\nnext line',
    b'a\r\nb\r\nc\r\nd',
    b'x' * 9000 + b'\xff tail',
    'mixed � repl and  private'.encode('utf-8'),
]
caps = [None, 5, 10, 64]
cases = []
for data in byte_cases:
    for cap in caps:
        cases.append({
            'input_b64': base64.b64encode(data).decode(),
            'cap': cap,
            'from_file': extract_text_from_file(data, cap),
            'fallback': extract_text_fallback(data, cap),
        })

texts = [
    'plain ascii', 'café über', 'emoji ' + emoji + ' gone',
    'nbsp kept', 'ctrl\x01\x02\x03gone', 'nul\x00gone',
    'line\nbreaks\r\nkept\ttabs', ' sep ', 'astral pair ' + '\U0001D11E',
    'hi­soft', 'full￿width', '', '   ', ' ',
]
text_cases = [{
    'text': t,
    'sanitize': sanitize_text(t),
    'sanitize_cap10': sanitize_text(t, 10),
    'truncate5': truncate_text(t, 5),
    'printable_ratio': printable_ratio(t),
    'strip_blank': not t.strip(),
} for t in texts]

ocr_cases = []
for emb, ocr, q in [
    ('', 'x'*60, 0.8), ('', 'x'*50, 0.8), ('short', 'y'*51, 0.3),
    ('e'*100, 'o'*201, 0.2), ('e'*100, 'o'*200, 0.9), ('e'*150, 'o'*120, 0.6),
    ('e'*499, 'o'*101, 0.51), ('e'*500, 'o'*101, 0.9), ('e'*499, 'o'*101, 0.5),
    ('e'*60, 'o'*500, 0.45), ('  pad  ' + 'e'*8, 'o'*60, 0.6), (None, 'o'*60, 0.6),
]:
    use, reason = should_use_ocr(emb, ocr, q)
    ocr_cases.append({'emb': emb, 'ocr': ocr, 'quality': q, 'use': use,
                      'reason': reason,
                      'final': get_final_text(emb, ocr, reason)})

wordlist = set(open('/root/repo/src/main/resources/graft/wordlist.txt').read().strip().split('\n'))
quality_texts = [
    'the quick brown fox and the lazy dog in the house',
    'xqz jkl vwp qrs mno zzz yyy xxx',
    'der mann und die frau in dem haus',
    'a b c', 'one two', 'Hello, world! This is good text.',
    'x1x y2y z3z w4w v5v u6u',
]
quality_cases = [{'text': t, 'quality': compute_quality(t, wordlist)} for t in quality_texts]

out = {'byte_cases': cases, 'text_cases': text_cases,
       'ocr_cases': ocr_cases, 'quality_cases': quality_cases,
       'python': sys.version}
with open('/root/repo/src/test/resources/golden/text_kernel.json','w') as f:
    json.dump(out, f, ensure_ascii=True, indent=1)
print('cases:', len(cases), len(text_cases), len(ocr_cases), len(quality_cases))
