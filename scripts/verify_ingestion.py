#!/usr/bin/env python3
"""Inspect the vector index directly: stats, per-job chunks, content search.

Parity target: reference ``scripts/verify_ingestion.py`` (direct Qdrant
inspection by job_id/content, collection stats, query-pipeline debug) —
pointed at the saved HBM index checkpoint instead of a Qdrant server.

Usage:
    python scripts/verify_ingestion.py --index data/index stats
    python scripts/verify_ingestion.py --index data/index job <job_id>
    python scripts/verify_ingestion.py --index data/index grep 加速
    python scripts/verify_ingestion.py --index data/index filter manufacturer=宝马 year=2023
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass

from automative_rag_tpu.index.flat import FlatIndex  # noqa: E402
from automative_rag_tpu.index.ivf import IVFIndex  # noqa: E402


def load_index(directory: str):
    if (Path(directory) / "ivf.npz").exists():
        return IVFIndex.load(directory)
    return FlatIndex.load(directory)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--index", default="data/index")
    parser.add_argument("command", choices=["stats", "job", "grep", "filter"])
    parser.add_argument("args", nargs="*")
    opts = parser.parse_args()

    index = load_index(opts.index)

    if opts.command == "stats":
        print(json.dumps(index.stats(), ensure_ascii=False, indent=2))
        return

    if opts.command == "job":
        job_id = opts.args[0]
        hits = [d for d in index._docs if d.metadata.get("job_id") == job_id]
        print(f"{len(hits)} chunks for job {job_id}")
        for doc in hits[:20]:
            print(f"  [{doc.metadata.get('chunk_index')}] {doc.page_content[:100]!r}")
        return

    if opts.command == "grep":
        needle = opts.args[0]
        hits = [d for d in index._docs if needle in d.page_content]
        print(f"{len(hits)} chunks contain {needle!r}")
        for doc in hits[:20]:
            print(f"  {doc.id[:8]} {doc.page_content[:100]!r}")
        return

    if opts.command == "filter":
        flt = {}
        for pair in opts.args:
            key, _, value = pair.partition("=")
            flt[key] = int(value) if value.isdigit() else value
        docs = index.metadata_search(flt, limit=1000)
        print(f"{len(docs)} chunks match {flt}")
        for doc in docs[:20]:
            print(f"  {doc.metadata.get('manufacturer')}/{doc.metadata.get('model')} "
                  f"{doc.metadata.get('year')}: {doc.page_content[:80]!r}")


if __name__ == "__main__":
    main()
