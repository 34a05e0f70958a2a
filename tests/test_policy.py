"""Dtype/batch policy parity with utilities_core.py:109-198."""

from __future__ import annotations

import pytest

from vector_db_light_spark.functions.policy import (
    DeviceInfo,
    appropriate_dtype,
    dtype_and_batch,
    embedding_batch_size,
)

CPU = DeviceInfo("cpu", False, (0, 0))
AMPERE = DeviceInfo("cuda", True, (8, 6))
PASCAL = DeviceInfo("cuda", True, (6, 1))


@pytest.mark.parametrize(
    "dev,half,native,want",
    [
        (CPU, True, "bfloat16", "float32"),      # cpu always fp32
        (AMPERE, True, "bfloat16", "bfloat16"),
        (PASCAL, True, "bfloat16", "float16"),   # no bf16 pre-Ampere
        (AMPERE, False, "bfloat16", "float32"),  # half unchecked
        (AMPERE, True, "float16", "float16"),
        (CPU, True, "float16", "float32"),
        (AMPERE, True, "float32", "bfloat16"),   # upcast policy on Ampere
        (PASCAL, True, "float32", "float16"),
        (AMPERE, False, "float32", "float32"),
        (AMPERE, True, "weird", "float32"),      # unrecognized -> fp32
    ],
)
def test_dtype_policy(dev, half, native, want):
    assert appropriate_dtype(dev, half, native) == want


def test_batch_size_policy():
    assert embedding_batch_size("BAAI/bge-small-en-v1.5", AMPERE) == 12
    assert embedding_batch_size("BAAI/bge-large-en-v1.5", AMPERE) == 6
    assert embedding_batch_size("Qwen/Qwen3-Embedding-0.6B", AMPERE) == 4
    assert embedding_batch_size("anything-else", AMPERE) == 8
    assert embedding_batch_size("BAAI/bge-small-en-v1.5", CPU) == 2  # cpu wins


def test_query_batches_are_one():
    dtype, batch = dtype_and_batch(AMPERE, True, "float32", "bge-base-en-v1.5",
                                   is_query=True)
    assert (dtype, batch) == ("bfloat16", 1)
