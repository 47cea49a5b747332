#!/usr/bin/env python3
"""Degenerate-input fixtures (r15): documents the standard corpora never
exercise — empty/whitespace-only text, empty tokens from doubled spaces,
single chars, unicode (multi-byte upper/lower + symbols), and a 520-byte
blob token. Regenerate with:

    python3 dev/gen_nasty.py /tmp/fix_nasty /tmp/fix_emptytok

then drive the WHOLE battery via graft.RunTolerant + selfcheck.py —
RunTolerant (r16) attempts every declared query and skips the ones the
fixture's documents-only table set cannot serve, so the doc-only list
is discovered, never hand-maintained (the r15 hand list silently
missed the multimodal family). The r15 sweep ran the hand-listed
doc-only battery over fix_nasty and the tokenizer/paragraph rows over
fix_emptytok; bugs it caught and fixed:
ANSI element_at on empty WordPiece segs, q_unigram_encode empty-word
fallback parity, NormalizeText oracle unicode lower() drift, byte- vs
codepoint-levenshtein in q_fuzzy_match, and the unbounded deletion-
variant fan-out on blob tokens (the 24-byte word cap). The r16
RunTolerant sweep (113 runnable rows per fixture, ALL OK after fixes)
additionally caught: q_mm_meta/q_mm_byte_stats oracles using codepoint
ascii() where Spark reads UTF-8 bytes (now hex(encode(text))),
stat.bloomFilter NPE on an empty build side (q_triangles' empty
support-filtered edge table; ScaleOps.bloomPrune now prunes
everything, exactly), and q_unigram_train seeding phantom '' pieces
from empty words (Spark sequence(1,0) DESCENDS while DuckDB range(1,1)
is empty — the trainer now drops the empty word, matching the oracle
and the r15 encode-side semantics).
"""
import sys
import duckdb

NASTY = """
  (0, '', 'en', 'src0'),
  (1, ' ', 'en', 'src0'),
  (2, 'x', 'en', 'src0'),
  (3, 'ünïcode ☃ 日本語 text blob', 'zh', 'src1'),
  (4, repeat('verylongtoken', 40), 'en', 'src1'),
  (5, 'normal words here for a control document with several tokens', 'en', 'src0'),
  (6, 'normal words here for a control document with several tokens', 'en', 'src1'),
  (7, 'a b c d e f g h i j k l m n o p q r s t', 'de', 'src2')"""

EMPTYTOK = """
  (0, 'hello  world', 'en', 'src0'),
  (1, ' leading space', 'en', 'src0'),
  (2, 'trailing space ', 'en', 'src0'),
  (3, 'hello world plain text here', 'en', 'src0'),
  (4, 'a  b  c', 'en', 'src0')"""


def write(rows, outdir):
    duckdb.sql(
        f"""COPY (SELECT CAST(c0 AS BIGINT) AS doc_id, c1 AS text,
        c2 AS lang, c3 AS source, CAST(length(c1) AS BIGINT) AS n_chars
        FROM (VALUES {rows}) t(c0,c1,c2,c3))
        TO '{outdir}/documents.parquet' (FORMAT parquet)""")


if __name__ == "__main__":
    import os
    nasty = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fix_nasty"
    etok = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fix_emptytok"
    os.makedirs(nasty, exist_ok=True)
    os.makedirs(etok, exist_ok=True)
    write(NASTY, nasty)
    write(EMPTYTOK, etok)
    print(f"wrote {nasty}/documents.parquet and {etok}/documents.parquet")
