"""Skewed dedup/ANN stress corpora (VERDICT r6 ask #3).

Synthesizes duplicate-with-noise documents and embeddings at a Zipf
topic distribution — the shape that breaks naive within-cluster pair
stages: one topic swallows most of the corpus, so a coarse quantizer
puts a huge member count behind one centroid and Σ|cluster|² explodes
unless the re-split guard fires.

Deterministic (seeded numpy), pyarrow-written, 10× is the same
generator at 10·n.  Used by tests/test_skew_guards.py (guard
activation) and scripts/skew_stress.py (1×/10× wall-time table in
PERF.md).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = [
    f"w{i:03d}" for i in range(400)
]  # closed vocabulary keeps shingle space realistic

N_TOPICS = 16
ZIPF_S = 1.6  # topic weights ∝ rank^-s → topic 0 takes ~45-60%


def _topic_weights(n_topics: int = N_TOPICS, s: float = ZIPF_S) -> np.ndarray:
    w = 1.0 / np.arange(1, n_topics + 1) ** s
    return w / w.sum()


def synth_documents(n: int, seed: int = 7) -> pa.Table:
    """Near-duplicate-heavy corpus: each topic has a 60-word base text;
    a document is its topic's base with ~4% of words mutated (a genuine
    near-dup of every sibling), plus a 10% slice of unique junk docs so
    the pipeline sees non-duplicates too."""
    rng = np.random.RandomState(seed)
    weights = _topic_weights()
    bases = [
        rng.choice(_WORDS, size=60, replace=True).tolist() for _ in range(N_TOPICS)
    ]
    topics = rng.choice(N_TOPICS, size=n, p=weights)
    texts = []
    for i in range(n):
        if rng.rand() < 0.10:  # unique junk
            texts.append(" ".join(rng.choice(_WORDS, size=40, replace=True)))
            continue
        words = list(bases[topics[i]])
        for _ in range(max(1, int(len(words) * 0.04))):
            words[rng.randint(len(words))] = _WORDS[rng.randint(len(_WORDS))]
        texts.append(" ".join(words))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array([f"t{t}" for t in topics]),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )


def synth_embeddings(n: int, dim: int = 32, seed: int = 11) -> pa.Table:
    """Skewed semantic clusters: unit topic centers, members = center +
    small gaussian noise (cosine ≳ 0.98 within topic); 20% of rows are
    EXACT copies of an earlier row (the skew driver k-means can never
    split — exercises the exact-dup pre-reduction guard)."""
    rng = np.random.RandomState(seed)
    weights = _topic_weights()
    centers = rng.standard_normal((N_TOPICS, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    topics = rng.choice(N_TOPICS, size=n, p=weights)
    vecs = (
        centers[topics] + rng.standard_normal((n, dim)).astype(np.float32) * 0.05
    ).astype(np.float32)
    for i in range(1, n):
        if rng.rand() < 0.20:
            j = rng.randint(i)
            vecs[i] = vecs[j]
            topics[i] = topics[j]
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array(topics.astype(np.int32)),
        }
    )


def write_corpus(out_dir: str, n_docs: int, n_vecs: int, seed: int = 7) -> str:
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(synth_documents(n_docs, seed), f"{out_dir}/documents.parquet")
    pq.write_table(
        synth_embeddings(n_vecs, seed=seed + 4), f"{out_dir}/embeddings.parquet"
    )
    return out_dir
