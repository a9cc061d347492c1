"""Pin expected outputs for the two formerly rows-only suite queries.

`bpe_train_merges` and `pack_best_fit_pieces` have feedback loops that
plain SQL cannot express, so their DuckDB oracles read a pinned fixture
parquet instead of recomputing.  The fixtures are generated HERE, by
pure-Python reference implementations that share no code with the Spark
kernels in mario_spark/ops (they are the same references the pytest
twins `test_bpe_train_matches_python_reference` /
`test_pack_best_fit_invariants` encode), run over the driver testdata
at every scale factor.  Each fixture row carries `corpus_chars` =
SUM(n_chars) of the generating corpus, so a single sf-agnostic oracle
SQL can select the rows for whichever corpus the driver registered:

    SELECT ... FROM read_parquet('<fixture>')
    WHERE corpus_chars = (SELECT SUM(n_chars) FROM documents)

(sf0.001 and sf0.01 both hold 500 docs, so row count alone cannot
discriminate; total char mass can: 153156 vs 149174 vs 1485576.)

Regenerate with:  python scripts/gen_rows_only_fixtures.py
"""

from __future__ import annotations

import re
from collections import Counter
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "tests" / "fixtures"
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]

# Same token pattern as ops/sample._BPE_PAT; re.ASCII pins \s to the
# ASCII class, matching Java regex's default (non-UNICODE_CHARACTER_CLASS)
# semantics used by Spark's regexp_extract_all.
_PAT = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]", re.ASCII)


def ref_bpe_train(texts: list[str], n_merges: int = 5) -> list[tuple[str, str]]:
    """Single-process BPE trainer: count desc / pair asc tie-break,
    rule k's merge applied before counting for rule k+1."""
    rules: list[tuple[str, str]] = []
    for _ in range(n_merges):
        cnt: Counter = Counter()
        for t in texts:
            syms = list(t or "")
            for a, b in rules:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cnt.update(zip(syms, syms[1:]))
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        rules.append(best)
    return rules


def ref_pack_best_fit(
    docs: list[tuple[int, str]], seq_len: int = 256, n_shards: int = 8
) -> pd.DataFrame:
    """FFD packing per shard = doc_id % n_shards: long docs shed
    floor(n/L) full-sequence pieces (one bin each, enumerated first in
    (doc_id) order), remainders pool into first-fit-decreasing with
    (-len, doc_id, piece_idx) tie-break; zero-token docs keep one empty
    piece."""
    L = int(seq_len)
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for doc_id, text in docs:
        n = len(_PAT.findall((text or "").lower()))
        by_shard.setdefault(doc_id % n_shards, []).append((doc_id, n))
    rows = []
    for shard, members in by_shard.items():
        pieces = []  # (len, doc_id, piece_idx, is_full)
        for doc_id, n in sorted(members):
            full, rem = divmod(n, L)
            for i in range(full):
                pieces.append((L, doc_id, i, True))
            if rem > 0 or n == 0:
                pieces.append((rem, doc_id, full, False))
        out = []  # (doc_id, piece_idx, len, bin_id)
        next_bin = 0
        for ln, doc_id, idx, _ in (p for p in pieces if p[3]):
            out.append((doc_id, idx, ln, next_bin))
            next_bin += 1
        bins: list[int] = []
        base = next_bin
        for ln, doc_id, idx, _ in sorted(
            (p for p in pieces if not p[3]), key=lambda p: (-p[0], p[1], p[2])
        ):
            for b, cap in enumerate(bins):
                if cap >= ln:
                    bins[b] = cap - ln
                    out.append((doc_id, idx, ln, base + b))
                    break
            else:
                bins.append(L - ln)
                out.append((doc_id, idx, ln, base + len(bins) - 1))
        df = pd.DataFrame(
            out, columns=["doc_id", "piece_idx", "n_tokens", "bin_id"]
        )
        df["shard"] = shard
        df["bin_fill"] = df.groupby("bin_id")["n_tokens"].transform("sum")
        rows.append(df)
    res = pd.concat(rows, ignore_index=True)
    return res[["doc_id", "shard", "piece_idx", "n_tokens", "bin_id",
                "bin_fill"]]


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    bpe_frames, pack_frames = [], []
    for sf_dir in SF_DIRS:
        t = pq.read_table(f"{sf_dir}/documents.parquet")
        corpus_chars = int(pd.Series(t.column("n_chars").to_pylist()).sum())
        doc_ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()

        merges = ref_bpe_train(texts, n_merges=5)
        b = pd.DataFrame(
            [(i, a, bb) for i, (a, bb) in enumerate(merges)],
            columns=["rank", "left", "right"],
        )
        b["corpus_chars"] = corpus_chars
        bpe_frames.append(b)

        p = ref_pack_best_fit(list(zip(doc_ids, texts)), seq_len=256,
                              n_shards=8)
        p["corpus_chars"] = corpus_chars
        pack_frames.append(p)
        print(f"{sf_dir}: corpus_chars={corpus_chars} "
              f"bpe_rows={len(b)} pack_rows={len(p)}")

    pd.concat(bpe_frames, ignore_index=True).astype(
        {"rank": "int64", "corpus_chars": "int64"}
    ).to_parquet(OUT / "bpe_train_merges.parquet", index=False)
    pd.concat(pack_frames, ignore_index=True).astype("int64").to_parquet(
        OUT / "pack_best_fit_pieces.parquet", index=False
    )
    print(f"wrote {OUT}/bpe_train_merges.parquet and pack_best_fit_pieces.parquet")


if __name__ == "__main__":
    main()
