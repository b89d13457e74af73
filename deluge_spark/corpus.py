"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

The canonical input shape from BASELINE.json ``input_hint``:
``(repo string, path string, commit string, lang string, content string)``.
Generated with a fixed seed, pure numpy — no external data. Contains, by
construction:

- cross-language hot terms (``import``, ``return``, ``the``) in >50% of docs
  (exercises hot-term salting),
- rare terms unique to 1–3 docs (``rareterm{i}``),
- known camelCase/snake_case identifiers asserted in tokenizer tests,
- a few empty documents and a few large (≥256 KB) documents.

Also provides the adapter mapping the driver's generic
``documents.parquet`` fixture (doc_id, text, lang, source, n_chars) onto the
corpus shape (FIXTURES.md §5).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42
LANGS = ["python", "go", "java", "js", "rust", "c"]
LANG_EXT = {"python": "py", "go": "go", "java": "java", "js": "js",
            "rust": "rs", "c": "c"}
LANG_W = [0.30, 0.15, 0.20, 0.15, 0.10, 0.10]

# hot terms planted in >50% of docs; common code words for the long tail
HOT = ["import", "return", "the"]
COMMON = [
    "def", "func", "class", "struct", "static", "void", "self", "value",
    "result", "error", "data", "index", "query", "table", "config", "string",
    "buffer", "client", "server", "request", "response", "parse", "write",
    "read", "open", "close", "append", "merge", "split", "count", "total",
]
CAMEL_IDENTS = [
    "getHTTPResponse", "parseJSONBody", "buildIndexSegment", "maxDocFrequency",
    "snake_case_ident", "block_max_score", "computeAvgDocLen", "termFreqTable",
]


def corpus_sizes(sf: float) -> int:
    """~500 docs at sf0.001, 5k at sf0.01, 50k at sf0.1."""
    return max(10, int(round(500_000 * sf)))


def generate_corpus_pdf(sf: float, seed: int = SEED,
                        body_scale: int = 1) -> pd.DataFrame:
    """Build the corpus as a pandas DataFrame (vectorized numpy, seeded).

    ``body_scale`` multiplies document body length (bench knob: heavier docs
    raise the compute-to-I/O ratio toward real source-file density)."""
    n = corpus_sizes(sf)
    rng = np.random.default_rng(seed)

    n_repos = max(4, int(np.sqrt(n) / 2))
    repo_idx = rng.integers(0, n_repos, n)
    repos = np.array([f"org{i % 7}/repo{i}" for i in range(n_repos)])

    lang_idx = rng.choice(len(LANGS), size=n, p=LANG_W)
    langs = np.array(LANGS)[lang_idx]
    exts = np.array([LANG_EXT[l] for l in LANGS])[lang_idx]

    pkgs = rng.integers(0, 40, n)
    names = rng.integers(0, 10_000, n)
    paths = np.array([
        f"src/pkg{pkgs[i]}/mod{names[i]}_{i}.{exts[i]}" for i in range(n)
    ])

    commits = np.array([
        hashlib.sha1(f"{seed}:{repos[repo_idx[i]]}".encode()).hexdigest()
        for i in range(n)
    ])

    # content: seeded bag of hot/common words + identifiers + literals
    body_len = rng.integers(20, 120, n) * body_scale
    vocab = np.array(COMMON + [f"ident{i}" for i in range(2000)])
    # Zipf-ish weights over the vocab
    w = 1.0 / np.arange(1, len(vocab) + 1) ** 0.9
    w /= w.sum()

    contents = []
    hot_mask = rng.random(n) < 0.6  # hot terms in ~60% of docs
    camel_pick = rng.integers(0, len(CAMEL_IDENTS), n)
    # one vectorized draw for all bodies (per-doc rng.choice with weights is
    # ~ms/call — prohibitive at bench scales)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(body_len, out=offsets[1:])
    flat = rng.choice(vocab, size=int(offsets[-1]), p=w)
    hot_prefix = " ".join(HOT) + " "
    for i in range(n):
        words = " ".join(flat[offsets[i]:offsets[i + 1]])
        if hot_mask[i]:
            words = hot_prefix + words
        lang = langs[i]
        doc = (
            f"// {lang} module {i}\n"
            + ("import os\n" if hot_mask[i] else "")
            + f"def {CAMEL_IDENTS[camel_pick[i]]}(x):\n    "
            + words + " " + CAMEL_IDENTS[camel_pick[i]]
            + f'\n    s = "literal_{i % 97}"\n    return x\n'
        )
        contents.append(doc)

    # rare terms unique to 1–3 docs
    n_rare = max(3, n // 100)
    for r in range(n_rare):
        owners = rng.integers(0, n, rng.integers(1, 4))
        for o in owners:
            contents[o] += f"\n# rareterm{r}\n"

    # a few empty and a few very large docs
    for j in range(min(3, n)):
        contents[j * (n // 4 + 1) % n] = ""
    big = " ".join(["bigblock " * 8] * 4096)  # ~ 288 KB
    for j in range(min(2, n)):
        k = (7 + j * (n // 3 + 1)) % n
        contents[k] = contents[k] + " " + big

    pdf = pd.DataFrame(
        {
            "repo": repos[repo_idx],
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )
    # natural key must be unique: (repo, path, commit) — paths embed row idx
    return pdf


def write_corpus_parquet(spark, out_dir: str, sf: float, seed: int = SEED,
                         partitions: int = 8, body_scale: int = 1) -> None:
    """Write the corpus as a repo-partitioned parquet table (Iceberg stand-in:
    the sandbox image has no Iceberg jars; layout + manifest semantics are
    preserved — see index.build)."""
    pdf = generate_corpus_pdf(sf, seed, body_scale)
    df = spark.createDataFrame(pdf)
    (df.repartition(partitions, "repo")
       .write.mode("overwrite").parquet(out_dir))


def documents_as_corpus(spark, sf_dir: str):
    """Adapter: driver fixture documents.parquet → corpus shape
    (FIXTURES.md §5): content := text, repo := source,
    path := source || '/' || doc_id, commit := sha1(seed), keep lang."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    commit = hashlib.sha1(f"{SEED}".encode()).hexdigest()
    return df.select(
        F.col("source").alias("repo"),
        F.concat_ws("/", "source", "doc_id").alias("path"),
        F.lit(commit).alias("commit"),
        F.col("lang"),
        F.col("n_chars"),  # typed stored field: range-filter target
        F.col("text").alias("content"),
        F.col("doc_id"),
    )
