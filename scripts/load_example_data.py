#!/usr/bin/env python3
"""Seed the system with an example automotive corpus.

Parity target: reference ``scripts/load_example_data.py`` (the §6 eval
corpus seeder). The reference seeds YouTube/Bilibili/PDF/manual-text
examples via the API; without egress this seeder generates a synthetic but
realistic bilingual corpus (manufacturers × models × spec templates → ~1K
chunks) and ingests it through the same job-chain path, either in-process
or against a running API (--api http://host:port).

Usage:
    python scripts/load_example_data.py             # in-process, tiny encoder
    python scripts/load_example_data.py --api http://localhost:8000
    python scripts/load_example_data.py --n 2000    # corpus size
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from automative_rag_tpu.ingestion.metadata import MODEL_CATALOG  # noqa: E402

SPEC_TEMPLATES = [
    "{model} {year}款 百公里加速{acc}秒，最高时速{speed}公里/小时。",
    "{model} {year}款 搭载{power}马力发动机，峰值扭矩{torque}牛米。",
    "{model} {year}款 综合油耗{fuel}L/100km，油箱容积{tank}L。",
    "{model} {year}款 车身尺寸长{length}mm，轴距{wheelbase}mm。",
    "{model} {year}款 续航里程{range}公里，快充30分钟可达80%。",
    "The {year} {model} accelerates 0-100 km/h in {acc} seconds with {power} hp.",
    "{model} {year}款 售价{price}万元起，提供{warranty}年质保。",
]

REVIEW_TEMPLATES = [
    "试驾{model}的感受：动力输出线性，底盘调校偏舒适，隔音表现优秀。author: 车评人{reviewer} views: {views} source: text",
    "{model}车主一年使用报告：优点是空间大、配置高；缺点是保值率一般。",
    "对比测试中，{model}的操控表现优于同级平均水平，刹车距离{brake}米。",
]


def generate_corpus(n: int, seed: int = 42):
    rng = random.Random(seed)
    models = list(MODEL_CATALOG)
    texts = []
    while len(texts) < n:
        model = rng.choice(models)
        year = rng.randint(2018, 2024)
        values = {
            "model": model,
            "year": year,
            "acc": round(rng.uniform(3.5, 12.0), 1),
            "speed": rng.randrange(180, 310, 10),
            "power": rng.randrange(110, 650, 10),
            "torque": rng.randrange(200, 900, 25),
            "fuel": round(rng.uniform(4.0, 12.0), 1),
            "tank": rng.randrange(40, 90, 5),
            "length": rng.randrange(4300, 5300, 25),
            "wheelbase": rng.randrange(2600, 3200, 5),
            "range": rng.randrange(400, 1000, 10),
            "price": rng.randrange(10, 120, 2),
            "warranty": rng.choice([3, 4, 5, 6]),
            "reviewer": rng.choice(["老王", "小李", "阿强", "Jenny"]),
            "views": rng.randrange(1000, 2_000_000, 500),
            "brake": round(rng.uniform(33.0, 42.0), 1),
        }
        template = rng.choice(SPEC_TEMPLATES + REVIEW_TEMPLATES)
        texts.append(template.format(**values))
    return texts


def seed_via_api(api: str, texts):
    job_ids = []
    for text in texts:
        req = urllib.request.Request(
            f"{api}/ingest/text",
            data=json.dumps({"content": text}, ensure_ascii=False).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            job_ids.append(json.loads(resp.read())["job_id"])
    return job_ids




def _pin_platform(use_tpu: bool = False) -> None:
    """Smoke scripts default to CPU (tiny encoders; the tunneled TPU's
    remote compile is minutes-slow); pass --tpu to run on the chip."""
    if use_tpu:
        return
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1000)
    parser.add_argument("--api", default="", help="running API base URL; default in-process")
    parser.add_argument("--batch", type=int, default=1, help="texts per ingest job (batching >1 merges metadata)")
    parser.add_argument("--tpu", action="store_true", help="run on the TPU backend")
    args = parser.parse_args()
    _pin_platform(args.tpu)

    texts = generate_corpus(args.n)
    t0 = time.time()
    if args.api:
        job_ids = seed_via_api(args.api.rstrip("/"), texts)
        print(f"submitted {len(job_ids)} ingest jobs via {args.api}")
        return

    from automative_rag_tpu.app import RAGApplication

    app = RAGApplication(tiny=True)
    try:
        for i in range(0, len(texts), args.batch):
            blob = "\n\n".join(texts[i : i + args.batch])
            job_id = app.ingest_text(blob)
            while app.tracker.get_job(job_id)["status"] not in ("completed", "failed"):
                time.sleep(0.05)
        app.save_index()
        stats = app.index.stats()
        print(f"seeded {stats['count']} chunks in {time.time()-t0:.1f}s -> {app.settings.index_dir}")
        print(json.dumps(stats, ensure_ascii=False, indent=2))
    finally:
        app.shutdown()


if __name__ == "__main__":
    main()
