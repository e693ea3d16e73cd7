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


@pytest.mark.slow
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


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["fc", "cnn_blstm"])
def test_export_batched_matches_single(tmp_path, kind):
    """batch>1 throughput artifacts must reproduce the batch-1 path row by
    row, including mixed lengths packed into one call and the zero-length
    surplus rows of a final partial group."""
    cfg = ModelConfig(
        generator=kind,
        hidden_size=16,
        num_layers=1,
        cnn_blocks=1,
        blstm_size=8,
        compute_dtype="float32",
    )
    gen = build_generator(cfg, VOC, 7)
    rng = np.random.default_rng(1)
    in_stats, out_stats = _stats(7), _stats(15)
    params = gen.init(jax.random.key(0), jnp.zeros((1, 64, 7), jnp.float32))

    d1 = str(tmp_path / "b1")
    write_export(
        d1,
        export_generator(gen.apply, params, in_stats, out_stats, 7, (64,)),
        7, 15, {"kind": "pml"},
    )
    d4 = str(tmp_path / "b4")
    write_export(
        d4,
        export_generator(
            gen.apply, params, in_stats, out_stats, 7, (64,), batch=4
        ),
        7, 15, {"kind": "pml"}, batch=4,
    )

    labs = [rng.normal(size=(n, 7)).astype(np.float32) for n in (50, 30, 64, 17, 41)]
    ex1, ex4 = ExportedGenerator(d1), ExportedGenerator(d4)
    assert ex4.batch == 4
    want = [ex1(l) for l in labs]
    got = ex4.predict_batch(labs)
    for w, g, l in zip(want, got, labs):
        assert g.shape == (l.shape[0], 15)
        np.testing.assert_allclose(g, w, atol=1e-5, err_msg=kind)
    # single-utterance call on a batched artifact also works
    np.testing.assert_allclose(ex4(labs[0]), want[0], atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize(
    "kind,kw",
    [
        ("pml", dict(spec_size=17, nm_size=9)),  # default closed-loop path
        ("world", dict(spec_size=17, nm_size=9, vuv_rule="bap")),
        ("melspec", dict(mel_size=20)),
    ],
)
def test_export_synthesis_bit_exact(tmp_path, kind, kw):
    """The features→waveform StableHLO artifact must reproduce
    ``Vocoder.synthesize`` BIT-FOR-BIT on the same backend — the full
    default synthesis path (closed-loop for pml/world), with the in-graph
    pad tail matching each vocoder's host-side convention and WORLD's
    host-side voicing decision applied by the loader
    (``export_preprocess``)."""
    from percivaltts_tpu.eval.export import ExportedSynthesizer, export_synthesis
    from percivaltts_tpu.vocoders import get_vocoder

    import dataclasses

    voc = get_vocoder(VocoderConfig(kind=kind, fs=16000, **kw))
    rng = np.random.default_rng(3)
    T = 100  # below the 128-frame bound: exercises the pad tail
    F = voc.feature_size
    if kind == "melspec":
        feats = (rng.normal(size=(T, F)) - 6.0).astype(np.float32)
    else:
        feats = np.zeros((T, F), np.float32)
        feats[:, 0] = np.log(140.0) + 0.1 * rng.normal(size=T)
        s0 = 1 if kind == "pml" else 2
        feats[:, s0 : s0 + 17] = rng.normal(size=(T, 17)) * 0.5 - 4.0
        feats[:, s0 + 17 :] = np.clip(rng.uniform(size=(T, F - s0 - 17)), 0, 1)
        if kind == "world":
            # soft vuv track: exercises the bap-rule host decision
            feats[:, 1] = np.clip(
                0.5 + 0.4 * np.sin(np.arange(T) / 7.0), 0.06, 0.94
            )

    arts = export_synthesis(voc, (100,), batch=1)
    assert sorted(arts) == [128]  # bound rounds up to the frame multiple
    d = str(tmp_path / "export")
    write_export(
        d, {128: b"gen-placeholder"}, 1, F,
        dataclasses.asdict(voc.cfg),
        syn_artifacts=arts, hop=voc.cfg.shift_samples,
    )
    syn = ExportedSynthesizer(d)
    wav = syn(feats)
    want = voc.synthesize(feats, seed=0)
    assert wav.shape == want.shape == (T * voc.cfg.shift_samples,)
    assert np.array_equal(wav, want), (
        f"{kind}: max diff {np.max(np.abs(wav - want))}"
    )
