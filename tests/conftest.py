"""Test configuration: force CPU with 8 virtual devices.

The mesh shard/merge path is exercised on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``), filling the reference's biggest
testing gap — it had no multi-node tests at all (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# hard-set (the harness exports JAX_PLATFORMS=axon for the real chip)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# the axon sitecustomize hook force-registers the TPU backend and pins
# jax_platforms; pin it back to CPU before any backend initializes
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def sample_documents():
    """Small automotive corpus mirroring the reference test fixtures
    (tests/conftest.py:167-215): distinct manufacturers/models/years."""
    from automative_rag_tpu.documents import Document

    specs = [
        ("宝马5系 2023款 加速时间 6.9秒", "BMW", "5 Series", 2023, "sedan"),
        ("宝马X5 2022款 SUV 动力强劲", "BMW", "X5", 2022, "suv"),
        ("奔驰E级 2023款 舒适豪华", "Mercedes", "E-Class", 2023, "sedan"),
        ("特斯拉Model 3 2023款 纯电动", "Tesla", "Model 3", 2023, "sedan"),
        ("丰田凯美瑞 2021款 混合动力", "Toyota", "Camry", 2021, "sedan"),
        ("Tesla Model Y 2022 electric SUV range 500km", "Tesla", "Model Y", 2022, "suv"),
    ]
    docs = []
    for i, (text, manu, model, year, cat) in enumerate(specs):
        docs.append(
            Document(
                page_content=text,
                metadata={
                    "manufacturer": manu,
                    "model": model,
                    "year": year,
                    "category": cat,
                    "source": "text",
                    "source_id": f"src-{i % 3}",
                },
            )
        )
    return docs
