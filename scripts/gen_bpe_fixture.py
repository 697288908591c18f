#!/usr/bin/env python3
"""Generate the BPE fixture: a trained merge table + per-document token
counts, used by graft.operators.Bpe and the text_tokens_bpe / pack_bpe
oracles.

Independence contract: this file is the ORACLE-side implementation — a
from-scratch Python replica of the pre-tokenizer + merge loop that
graft.operators.Bpe implements in Scala. The driver's DuckDB oracle joins
documents to the count fixture by md5(text), so any divergence between the
two implementations fails the correctness gate on real data.

Outputs (committed to the repo):
  src/main/resources/graft/bpe_merges.txt   one merge per line, rank = line
      number, each side URL-quoted (tokens may contain spaces/controls)
  src/main/resources/graft/bpe_counts.parquet
      (text_md5, n_pre_tokens, n_bpe_tokens) for every distinct document
      text across /root/testdata/sf{0.001,0.01,0.1}

Training: character-level BPE over the sf0.001 corpus pre-tokens (GPT-2
style: merges never cross pre-token boundaries; the leading space belongs
to the token). Deterministic: ties on pair frequency break lexicographically.
"""
import hashlib
import sys
import unicodedata
import urllib.parse
from collections import Counter
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
TRAIN_DIR = SF_DIRS[0]
NUM_MERGES = 384

# Java regex \s is ASCII-only by default —   etc. fall through to the
# symbol-run class, and the Scala side (java.util.regex on BpeRe) relies on
# exactly that. Mirror it.
JAVA_WS = set(" \t\n\x0b\f\r")
CONTRACTIONS = ["s", "t", "re", "ve", "m", "ll", "d"]  # alternation order


def _is_letter(c: str) -> bool:
    return unicodedata.category(c).startswith("L")


def _is_number(c: str) -> bool:
    return unicodedata.category(c).startswith("N")


def _is_symbol(c: str) -> bool:
    return c not in JAVA_WS and not _is_letter(c) and not _is_number(c)


def pretokenize(text: str) -> list:
    """Leftmost-first scan equivalent to java.util.regex find-all over
    graft's BpeRe: '(?:s|t|re|ve|m|ll|d) | ?\\p{L}+ | ?\\p{N}+
    | ?[^\\s\\p{L}\\p{N}]+ | \\s+ (alternation order is match priority)."""
    out = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        # 1. contraction suffix
        if c == "'":
            hit = next((s for s in CONTRACTIONS if text.startswith(s, i + 1)), None)
            if hit is not None:
                out.append("'" + hit)
                i += 1 + len(hit)
                continue
        # 2..4: optionally-space-prefixed runs (Java backtracks ' ?' to
        # empty when the run class doesn't follow the space)
        matched = False
        for pred in (_is_letter, _is_number, _is_symbol):
            start = i + 1 if (c == " " and i + 1 < n and pred(text[i + 1])) else i
            if start < n and pred(text[start]):
                j = start + 1
                while j < n and pred(text[j]):
                    j += 1
                out.append(text[i:j])
                i = j
                matched = True
                break
        if matched:
            continue
        # 5. whitespace run
        if c in JAVA_WS:
            j = i + 1
            while j < n and text[j] in JAVA_WS:
                j += 1
            out.append(text[i:j])
            i = j
            continue
        raise AssertionError(f"unclassifiable char {c!r} at {i}")
    return out


def merge_once(parts: list, pair: tuple) -> list:
    """Left-to-right single-pair merge with skip-after-merge (GPT-2)."""
    out, i = [], 0
    while i < len(parts):
        if i + 1 < len(parts) and (parts[i], parts[i + 1]) == pair:
            out.append(parts[i] + parts[i + 1])
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


def encode(pre: str, ranks: dict) -> list:
    parts = list(pre)
    while len(parts) >= 2:
        best = min(
            (p for p in zip(parts, parts[1:]) if p in ranks),
            key=lambda p: ranks[p], default=None)
        if best is None:
            break
        parts = merge_once(parts, best)
    return parts


def train(pretoken_freq: Counter, num_merges: int) -> list:
    words = {w: list(w) for w in pretoken_freq}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, parts in words.items():
            f = pretoken_freq[w]
            for p in zip(parts, parts[1:]):
                pairs[p] += f
        if not pairs:
            break
        # deterministic: max count, lexicographically-smallest pair on ties
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        for w in words:
            words[w] = merge_once(words[w], best)
    return merges


def doc_texts(sfdir: str) -> list:
    return pq.read_table(f"{sfdir}/documents.parquet", columns=["text"]) \
        .column("text").to_pylist()


def main() -> None:
    freq = Counter()
    for t in doc_texts(TRAIN_DIR):
        freq.update(pretokenize(t))
    merges = train(freq, NUM_MERGES)
    ranks = {p: r for r, p in enumerate(merges)}
    print(f"trained {len(merges)} merges from {TRAIN_DIR} "
          f"({sum(freq.values())} pre-tokens, {len(freq)} distinct)")

    res = REPO / "src/main/resources/graft"
    res.mkdir(parents=True, exist_ok=True)
    (res / "bpe_merges.txt").write_text("".join(
        urllib.parse.quote(a, safe="") + " " + urllib.parse.quote(b, safe="") + "\n"
        for a, b in merges))

    rows = {}
    memo = {}
    for sfdir in SF_DIRS:
        for t in doc_texts(sfdir):
            key = hashlib.md5(t.encode()).hexdigest()
            if key in rows:
                continue
            pres = pretokenize(t)
            n_bpe = 0
            for p in pres:
                if p not in memo:
                    memo[p] = len(encode(p, ranks))
                n_bpe += memo[p]
            rows[key] = (len(pres), n_bpe)
    tbl = pa.table({
        "text_md5": list(rows.keys()),
        "n_pre_tokens": pa.array([v[0] for v in rows.values()], pa.int64()),
        "n_bpe_tokens": pa.array([v[1] for v in rows.values()], pa.int64()),
    })
    pq.write_table(tbl, res / "bpe_counts.parquet")
    print(f"wrote {len(rows)} distinct-text count rows; "
          f"sample merges: {merges[:8]}")


if __name__ == "__main__":
    sys.exit(main())
