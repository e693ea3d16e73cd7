"""Serving-export unit tier: StableHLO artifacts must reproduce the live
model exactly, for frame-local AND recurrent generators (the CLI-level
export of a trained run is covered in test_e2e.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from percivaltts_tpu.config import ModelConfig, VocoderConfig
from percivaltts_tpu.data.normalize import NormStats
from percivaltts_tpu.eval.export import (
    ExportedGenerator,
    export_generator,
    write_export,
)
from percivaltts_tpu.models import build_generator

VOC = VocoderConfig(spec_size=9, nm_size=5)


def _stats(dim):
    rng = np.random.default_rng(dim)
    return NormStats(
        shift=rng.normal(size=dim).astype(np.float32),
        scale=(1.0 + rng.uniform(size=dim)).astype(np.float32),
    )


@pytest.mark.parametrize("kind", ["fc", "cnn_blstm"])
def test_export_roundtrip_exact(tmp_path, kind):
    cfg = ModelConfig(
        generator=kind,
        hidden_size=16,
        num_layers=1,
        cnn_blocks=1,
        blstm_size=8,
        compute_dtype="float32",
    )
    gen = build_generator(cfg, VOC, 7)
    rng = np.random.default_rng(0)
    lab = rng.normal(size=(50, 7)).astype(np.float32)
    in_stats, out_stats = _stats(7), _stats(15)

    padded = np.zeros((1, 64, 7), np.float32)
    padded[0, :50] = in_stats.normalize(lab)
    params = gen.init(jax.random.key(0), jnp.asarray(padded))

    arts = export_generator(gen.apply, params, in_stats, out_stats, 7, (64,))
    d = str(tmp_path / "export")
    write_export(d, arts, 7, 15, {"kind": "pml"})

    ex = ExportedGenerator(d)
    got = ex(lab)
    # live path under the SAME (bucket-bound) padding contract
    want = out_stats.denormalize(
        np.asarray(gen.apply(params, jnp.asarray(padded)))[0, :50]
    )
    np.testing.assert_allclose(got, want, atol=1e-5, err_msg=kind)

    with pytest.raises(ValueError):
        ex(np.zeros((65, 7), np.float32))
