"""Seeded synthetic BEIR-format fixture with COMPLEMENTARY relevance
signals, for end-to-end quality evaluation of the fusion matrix.

The reference reports its headline quality numbers (README.md:410-433)
as NDCG@10 / MAP@10 of hybrid fusion vs BM25 on BEIR datasets; external
downloads are out of scope here, so this generator builds a corpus where
the two signals are COMPLEMENTARY by construction — the property real
hybrid corpora have and the one fusion needs to demonstrate a lift:

- each topic has LEXICAL relevants (use the topic's query vocabulary —
  BM25 finds them) and SEMANTIC relevants (synonym vocabulary, zero
  lexical overlap with the query — only the embedding space finds them);
- embeddings cluster by topic (centroid + noise) for BOTH kinds of
  relevant; noise docs get isotropic embeddings;
- queries carry the topic centroid as their embedding.

A lexical-only ranker tops out at the lexical half of the qrels; a
dense-only ranker at the semantic half (plus lexical, which shares the
cluster); calibrated fusion should beat both.  Everything is seeded and
driver-generated (the fixture is small — quality eval, not scale).
"""

from __future__ import annotations

import json
import os

import numpy as np

TOPIC_WORDS = 6  # query-vocabulary words per topic
SYN_WORDS = 6  # synonym-vocabulary words per topic (disjoint)
FILLER_VOCAB = 200


def write_fixture(
    root: str,
    n_topics: int = 20,
    lexical_per_topic: int = 6,
    semantic_per_topic: int = 4,
    noise_docs: int = 100,
    distractors_per_topic: int = 5,
    dim: int = 32,
    seed: int = 42,
    lexical_noise_per_topic: int = 0,
) -> str:
    """Write corpus.jsonl / queries.jsonl / qrels/test.tsv +
    embeddings.npz (doc and query embeddings, keyed by external id).
    Returns the fixture directory.

    Signal asymmetry (what makes hybrid beat both single signals):
    LEXICAL relevants sit loosely in the embedding cluster (noise 0.9 —
    dense alone ranks them poorly), SEMANTIC relevants sit tightly
    (noise 0.2) but share zero query vocabulary, and each topic gets
    irrelevant DISTRACTORS at medium embedding distance (noise 0.55) —
    dense-only false positives that only the lexical signal can push
    back down."""
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "synthetic-beir")
    os.makedirs(os.path.join(d, "qrels"), exist_ok=True)

    filler = [f"filler{i}" for i in range(FILLER_VOCAB)]
    centroids = rng.normal(0, 1, (n_topics, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    corpus, qrels, doc_embs = [], [], {}
    did = 0

    def emit(text: str, emb: np.ndarray) -> str:
        nonlocal did
        ext = f"d{did:05d}"
        corpus.append({"_id": ext, "title": "", "text": text})
        doc_embs[ext] = emb.astype(np.float32)
        did += 1
        return ext

    for t in range(n_topics):
        topic_vocab = [f"topic{t}w{i}" for i in range(TOPIC_WORDS)]
        syn_vocab = [f"syn{t}w{i}" for i in range(SYN_WORDS)]
        for j in range(lexical_per_topic):
            words = list(rng.choice(topic_vocab, 4)) + list(rng.choice(filler, 8))
            rng.shuffle(words)
            emb = centroids[t] + rng.normal(0, 0.9, dim)
            ext = emit(" ".join(words), emb)
            qrels.append((f"q{t}", ext, 1))
        for j in range(semantic_per_topic):
            # ZERO overlap with the query vocabulary — only the
            # embedding cluster links these to the topic
            words = list(rng.choice(syn_vocab, 4)) + list(rng.choice(filler, 8))
            rng.shuffle(words)
            emb = centroids[t] + rng.normal(0, 0.2, dim)
            ext = emit(" ".join(words), emb)
            qrels.append((f"q{t}", ext, 2))
        for j in range(distractors_per_topic):
            # filler text, medium-distance embedding: a dense-only
            # ranker pulls these above the loose lexical relevants
            words = list(rng.choice(filler, 12))
            emit(" ".join(words), centroids[t] + rng.normal(0, 0.55, dim))
        for j in range(lexical_noise_per_topic):
            # off-topic pages that still contain ONE query term — the
            # real-web-text property that makes BM25 match non-relevant
            # docs; without these, every scored candidate is relevant
            # (prevalence 1.0) and the base-rate calibration story has
            # nothing to calibrate.  Isotropic embedding: dense doesn't
            # rescue them.  Default 0 keeps older fixtures byte-stable.
            words = [str(rng.choice(topic_vocab))] + list(rng.choice(filler, 11))
            rng.shuffle(words)
            emit(" ".join(words), rng.normal(0, 1, dim))
    for _ in range(noise_docs):
        words = list(rng.choice(filler, 12))
        emit(" ".join(words), rng.normal(0, 1, dim))

    queries, q_embs = [], {}
    for t in range(n_topics):
        qext = f"q{t}"
        queries.append(
            {"_id": qext, "text": " ".join(f"topic{t}w{i}" for i in range(3))}
        )
        q_embs[qext] = (centroids[t] + rng.normal(0, 0.05, len(centroids[t]))).astype(
            np.float32
        )

    with open(os.path.join(d, "corpus.jsonl"), "w") as f:
        for row in corpus:
            f.write(json.dumps(row) + "\n")
    with open(os.path.join(d, "queries.jsonl"), "w") as f:
        for row in queries:
            f.write(json.dumps(row) + "\n")
    with open(os.path.join(d, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for q, doc, rel in qrels:
            f.write(f"{q}\t{doc}\t{rel}\n")
    np.savez(
        os.path.join(d, "embeddings.npz"),
        doc_ids=np.array(list(doc_embs.keys())),
        doc_embs=np.stack(list(doc_embs.values())),
        query_ids=np.array(list(q_embs.keys())),
        query_embs=np.stack(list(q_embs.values())),
    )
    return d
