"""Generate a local sf1 stretch dataset: documents.parquet (10x sf0.1
rows) + embeddings.parquet (10x), distribution-matched to the driver's
sf0.1 tables and fully seed-pinned.

Why derive from sf0.1 instead of inventing a new corpus: the stretch
bench (scripts/bench_sf1.py) compares PER-DOC cost at sf0.1 vs sf1, so
the two inputs must differ only in row count — same vocabulary, same
token unigram distribution, same doc-length / lang / source mixes, same
embedding cluster structure (per-label centroid + isotropic noise
matched to the observed per-label std). Everything is computed from the
read-only driver tables with numpy PCG64 streams keyed by (seed, row),
so re-running the script reproduces the parquet byte-for-byte.

Writes to .localdata/sf1/ (gitignored — it is 10x testdata, ~35 MB).
Run:  python scripts/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 42
N_DOCS = 50_000
N_VECS = 20_000


def gen_documents(out_dir: str) -> None:
    base = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    # empirical ingredients (all deterministic functions of the source)
    toks = [t for text in base["text"] for t in text.split()]
    vocab, counts = np.unique(toks, return_counts=True)
    probs = counts / counts.sum()
    lens = np.array([len(t.split()) for t in base["text"]])
    langs, lcounts = np.unique(base["lang"], return_counts=True)
    lprobs = lcounts / lcounts.sum()
    n_src = base["source"].nunique()

    rng = np.random.Generator(np.random.PCG64(SEED))
    doc_lens = rng.choice(lens, size=N_DOCS, replace=True)
    doc_langs = rng.choice(langs, size=N_DOCS, p=lprobs)
    # duplicate structure, matched to the source corpus (8/5000 exact
    # dupes observed at sf0.1): i.i.d. token sampling alone would give
    # the dedup/LSH suite entries ZERO candidate pairs to verify, which
    # understates their sf1 cost. 0.16% exact copies + 0.3% near-dups
    # (5% of tokens resampled) of an earlier doc, ids deterministic.
    exact_ids = set(rng.choice(N_DOCS - 1, size=N_DOCS // 625, replace=False) + 1)
    near_ids = {
        i for i in (rng.choice(N_DOCS - 1, size=3 * N_DOCS // 1000, replace=False) + 1)
        if i not in exact_ids
    }
    texts: list[str] = []
    rows = []
    for i in range(N_DOCS):
        r = np.random.Generator(np.random.PCG64([SEED, 1, i]))
        if i in exact_ids:
            text = texts[int(r.integers(0, i))]
        elif i in near_ids:
            words = np.array(texts[int(r.integers(0, i))].split())
            flip = r.random(len(words)) < 0.05
            words[flip] = r.choice(vocab, size=int(flip.sum()), p=probs)
            text = " ".join(words)
        else:
            words = r.choice(vocab, size=int(doc_lens[i]), p=probs)
            text = " ".join(words)
        texts.append(text)
        rows.append((i, text, doc_langs[i], f"src{i % n_src}", len(text)))
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(df, schema=schema, preserve_index=False),
        f"{out_dir}/documents.parquet",
    )


def gen_embeddings(out_dir: str) -> None:
    base = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    mat = np.stack(base["embedding"].to_numpy()).astype(np.float64)
    labels = base["label"].to_numpy()
    uniq = np.sort(np.unique(labels))
    cents = np.stack([mat[labels == c].mean(axis=0) for c in uniq])
    stds = np.array(
        [(mat[labels == c] - cents[i]).std() for i, c in enumerate(uniq)]
    )
    lcounts = np.array([(labels == c).sum() for c in uniq])
    lprobs = lcounts / lcounts.sum()

    rng = np.random.Generator(np.random.PCG64([SEED, 2]))
    vlabels = rng.choice(uniq, size=N_VECS, p=lprobs)
    dim = mat.shape[1]
    noise = rng.standard_normal((N_VECS, dim))
    vecs = (cents[vlabels] + noise * stds[vlabels][:, None]).astype(
        np.float32
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECS, dtype=np.int64)),
            "embedding": pa.array(
                [v for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array(vlabels.astype(np.int32)),
        }
    )
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    os.makedirs(out_dir, exist_ok=True)
    gen_documents(out_dir)
    gen_embeddings(out_dir)
    print(f"wrote {out_dir}/documents.parquet ({N_DOCS} docs), "
          f"{out_dir}/embeddings.parquet ({N_VECS} vecs)")


if __name__ == "__main__":
    main()
