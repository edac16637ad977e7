"""Deterministic LARGER-scale synthetic documents/embeddings tables
(VERDICT r3 next-round #6).

The driver's testdata stops at sf0.1; the LSH/banding queries
(minhash_lsh_pairs, simhash_pairs, ngram_jaccard_pairs, dedup_groups,
embedding_near_dup_lsh, ann_*) are the ones whose candidate sets change
shape with corpus size, so the oracle gate needs one data point past
sf0.1. The driver's table generator is not shipped, so this produces the
same SHAPE deterministically (seeded numpy, no wall clock, no external
data): documents(doc_id BIGINT, text, lang, source, n_chars) over a
small vocabulary (shared shingles -> natural near-dup candidates, plus
~5% explicit mutated clones), embeddings(vec_id BIGINT,
embedding FLOAT[64], label INT) as 10 Gaussian clusters plus ~4%
near-duplicate clones. Spark and DuckDB read the SAME parquet, so gate
agreement at this scale is meaningful regardless of the generator
differing from the driver's.

Usage: python tools/gen_scale_testdata.py [out_dir] [n_docs] [n_vecs]
Default: .testdata_synth/sf0.3 with 15000 docs / 6000 vectors (3x sf0.1).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 424242

_VOCAB = {
    "en": ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
           "part", "hash", "merge", "batch", "spark", "a", "the", "line",
           "sort", "window", "join", "shuffle", "plan", "stage", "task",
           "node", "block", "page", "span", "byte", "read", "write", "skew"],
    "de": ["der", "die", "das", "zeile", "wert", "teil", "plan", "knoten",
           "block", "seite", "lesen", "schreiben", "schnell", "langsam",
           "tabelle", "fenster", "sortier", "misch", "stufe", "aufgabe"],
    "es": ["el", "la", "fila", "valor", "parte", "plan", "nodo", "bloque",
           "pagina", "leer", "rapido", "lento", "tabla", "ventana",
           "ordenar", "mezcla", "etapa", "tarea", "clave", "byte"],
    "fr": ["le", "la", "ligne", "valeur", "partie", "plan", "noeud",
           "bloc", "page", "lire", "rapide", "lent", "table", "fenetre",
           "trier", "melange", "etape", "tache", "cle", "octet"],
    "zh": ["biao", "hang", "zhi", "bufen", "jihua", "jiedian", "kuai",
           "yemian", "du", "kuai2", "man", "chuangkou", "paixu", "hunhe",
           "jieduan", "renwu", "jian", "zijie", "saomiao", "hebing"],
}
_LANGS = ["en", "zh", "es", "de", "fr"]
_LANG_P = [0.44, 0.15, 0.15, 0.13, 0.13]
N_SOURCES = 20
CLONE_FRAC = 0.05
EMB_DIM = 64
EMB_LABELS = 10
EMB_CLONE_FRAC = 0.04


def gen_documents(n_docs: int, rng: np.random.Generator) -> pa.Table:
    doc_ids, texts, langs, sources = [], [], [], []
    for d in range(n_docs):
        lang = _LANGS[int(rng.choice(len(_LANGS), p=_LANG_P))]
        vocab = _VOCAB[lang]
        if texts and rng.random() < CLONE_FRAC:
            # near-dup clone of a recent doc: same lang bucket not required
            # (dedup operators key on text, not lang)
            src_idx = int(rng.integers(max(0, d - 200), d))
            words = texts[src_idx].split(" ")
            # mutate ~5% of words so Jaccard/minhash see a NEAR duplicate
            for _ in range(max(1, len(words) // 20)):
                words[int(rng.integers(len(words)))] = vocab[
                    int(rng.integers(len(vocab)))
                ]
            text = " ".join(words)
        else:
            n_words = int(rng.integers(10, 120))
            text = " ".join(
                vocab[int(rng.integers(len(vocab)))] for _ in range(n_words)
            )
        doc_ids.append(d)
        texts.append(text)
        langs.append(lang)
        sources.append(f"src{int(rng.integers(N_SOURCES))}")
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n_vecs: int, rng: np.random.Generator) -> pa.Table:
    centers = rng.normal(0, 1.0, size=(EMB_LABELS, EMB_DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vec_ids, embs, labels = [], [], []
    for v in range(n_vecs):
        if embs and rng.random() < EMB_CLONE_FRAC:
            src = int(rng.integers(max(0, v - 100), v))
            e = np.asarray(embs[src]) + rng.normal(0, 0.005, EMB_DIM)
            lab = labels[src]
        else:
            lab = int(rng.integers(EMB_LABELS))
            e = centers[lab] * 0.25 + rng.normal(0, 0.1, EMB_DIM)
        vec_ids.append(v)
        embs.append(np.asarray(e, np.float32).tolist())
        labels.append(lab)
    return pa.table({
        "vec_id": pa.array(vec_ids, pa.int64()),
        "embedding": pa.array(embs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".testdata_synth/sf0.3"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 15000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 6000
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    pq.write_table(gen_documents(n_docs, rng), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(n_vecs, rng), f"{out}/embeddings.parquet")
    print(f"wrote {out}: documents={n_docs} embeddings={n_vecs}")


if __name__ == "__main__":
    main()
