"""Smoke/integration tier (SURVEY.md §4): the whole pipeline — demo corpus →
compose → train a few epochs → generate + objective measures — on a
miniature corpus, asserting completion, finite losses, and produced files."""

import json
import os

import numpy as np
import pytest

from percivaltts_tpu.cli import main as cli_main
from percivaltts_tpu.config import Configuration

pytestmark = pytest.mark.slow  # minutes-tier integration (VERDICT r3 item 9)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("demo_corpus"))
    rc = cli_main(["demo", "--out", root, "--num", "12", "--seed", "7"])
    assert rc == 0
    return root


def _write_cfg(corpus_root, workdir, **overrides):
    with open(os.path.join(corpus_root, "config.json")) as f:
        d = json.load(f)
    d["workdir"] = workdir
    d["data"].update(
        batch_size=2, bucket_bounds=[256], num_valid=2, num_test=2
    )
    d["vocoder"].update(spec_size=33, nm_size=17)
    d["model"].update(
        generator="fc", hidden_size=32, num_layers=2, compute_dtype="float32"
    )
    d["train"].update(trainer="lse", epochs=3, lr_gen=2e-3, checkpoint_every=1)
    for k, v in overrides.items():
        d[k].update(v) if isinstance(v, dict) else d.__setitem__(k, v)
    path = os.path.join(workdir, "cfg.json")
    os.makedirs(workdir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(d, f)
    return path


def test_demo_corpus_files(corpus):
    ids = open(os.path.join(corpus, "fileids.scp")).read().split()
    assert len(ids) == 12
    assert os.path.exists(os.path.join(corpus, "wav", ids[0] + ".wav"))
    assert os.path.exists(os.path.join(corpus, "label_state_align", ids[0] + ".lab"))
    assert os.path.exists(os.path.join(corpus, "questions.hed"))


def test_compose_train_generate(corpus, tmp_path):
    workdir = str(tmp_path / "exp")
    cfg_path = _write_cfg(corpus, workdir)

    assert cli_main(["compose", "--config", cfg_path]) == 0
    assert os.path.exists(os.path.join(workdir, "in_stats.npz"))
    assert os.path.exists(os.path.join(workdir, "out_stats.npz"))
    # feature cache populated
    cache = os.path.join(workdir, "feature_cache")
    f32 = [f for f in os.listdir(cache) if f.endswith(".f32")]
    assert len(f32) == 24  # 12 × (lab + cmp)

    assert cli_main(["train", "--config", cfg_path]) == 0
    metrics = [
        json.loads(l)
        for l in open(os.path.join(workdir, "metrics.jsonl"))
        if l.strip()
    ]
    epochs = [m for m in metrics if m["kind"] == "epoch"]
    assert len(epochs) == 3
    assert all(np.isfinite(m["loss"]) for m in epochs)
    assert epochs[-1]["loss"] < epochs[0]["loss"]
    assert all(np.isfinite(m["valid"]) for m in epochs)

    assert cli_main(["generate", "--config", cfg_path]) == 0
    with open(os.path.join(workdir, "measures.json")) as f:
        measures = json.load(f)
    assert np.isfinite(measures["mcd_db"]) and measures["mcd_db"] > 0
    assert "f0_rmse_hz" in measures and np.isfinite(measures["f0_rmse_hz"])
    assert "vuv_error_pct" in measures
    gen_dir = os.path.join(workdir, "generated")
    wavs = [f for f in os.listdir(gen_dir) if f.endswith(".wav")]
    assert len(wavs) == 2  # num_test

    assert cli_main(["plot", "--config", cfg_path]) == 0
    assert os.path.getsize(os.path.join(workdir, "curves.png")) > 5000

    # serving export: StableHLO artifacts reload model-code-free and must
    # reproduce the library predict path (normalize → generator →
    # denormalize) exactly on a shorter-than-bound utterance
    assert cli_main(["export", "--config", cfg_path]) == 0
    exp_dir = os.path.join(workdir, "export")
    assert os.path.exists(os.path.join(exp_dir, "manifest.json"))
    assert os.path.exists(os.path.join(exp_dir, "gen_t256.stablehlo"))

    from percivaltts_tpu.data.hts_labels import QuestionSet, binarize_label_file
    from percivaltts_tpu.data.normalize import NormStats
    from percivaltts_tpu.eval.export import ExportedGenerator
    from percivaltts_tpu.models.base import predict_utterance
    from percivaltts_tpu.training.checkpoints import CheckpointManager
    from percivaltts_tpu.training.state import abstract_gan_state

    cfg = Configuration.load(cfg_path)
    q = QuestionSet.from_hed(cfg.data.question_file)
    ids = open(os.path.join(corpus, "fileids.scp")).read().split()
    lab = None
    for uid in ids:  # first utterance that fits the exported bound
        cand = binarize_label_file(
            os.path.join(corpus, "label_state_align", uid + ".lab"),
            q,
            cfg.vocoder.shift_ms / 1000.0,
        ).astype(np.float32)
        if cand.shape[0] < 256:
            lab = cand
            break
    assert lab is not None

    exported = ExportedGenerator(exp_dir)
    got = exported(lab)

    in_stats = NormStats.load(os.path.join(workdir, "in_stats.npz"))
    out_stats = NormStats.load(os.path.join(workdir, "out_stats.npz"))
    state = abstract_gan_state(cfg, lab.shape[1])
    state = CheckpointManager(os.path.join(workdir, "checkpoints")).restore(
        state, best=True
    )
    # direct path pads to 64-multiples; the exported artifact pads to the
    # bucket bound — the FC generator is frame-local so both trims agree
    want = out_stats.denormalize(
        predict_utterance(
            state.gen.apply_fn, state.gen.params, in_stats.normalize(lab)
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-4)

    with pytest.raises(ValueError):
        exported(np.zeros((257, lab.shape[1]), np.float32))


@pytest.mark.parametrize("kind,extra", [("world", {}), ("melspec", {"mel_size": 24})])
def test_other_vocoders_end_to_end(corpus, tmp_path, kind, extra):
    """compose → short train → generate with the WORLD-style and mel
    vocoders; bounded streams must stay un-rescaled."""
    workdir = str(tmp_path / f"exp_{kind}")
    cfg_path = _write_cfg(corpus, workdir)
    with open(cfg_path) as f:
        d = json.load(f)
    d["vocoder"].update(kind=kind, **extra)
    # WORLD needs the model committed to a voicing pattern: its predicted
    # vuv stream passes clean_vuv, which (correctly) prunes the scattered
    # 1-frame voicing specks a 1-epoch model emits — leaving no both-voiced
    # frames and no F0 measure to assert on
    d["train"].update(epochs=4 if kind == "world" else 1)
    with open(cfg_path, "w") as f:
        json.dump(d, f)
    assert cli_main(["train", "--config", cfg_path]) == 0
    if kind == "world":
        stats = np.load(os.path.join(workdir, "out_stats.npz"))
        cfgv = Configuration.load(os.path.join(workdir, "config.json")).vocoder
        a, b = cfgv.streams["vuv"]
        assert np.all(stats["scale"][a:b] == 1.0)
        a, b = cfgv.streams["bap"]
        assert np.all(stats["scale"][a:b] == 1.0)
    assert cli_main(["generate", "--config", cfg_path, "--no-wav"]) == 0
    with open(os.path.join(workdir, "measures.json")) as f:
        m = json.load(f)
    assert np.isfinite(m["mcd_db"])
    if kind == "world":
        assert "f0_rmse_hz" in m
    else:
        assert "f0_rmse_hz" not in m  # mel has no f0 stream


def test_train_resume_cli(corpus, tmp_path):
    workdir = str(tmp_path / "exp2")
    cfg_path = _write_cfg(corpus, workdir)
    assert cli_main(["train", "--config", cfg_path]) == 0
    # resuming at max epochs is a no-op but must succeed
    assert cli_main(["train", "--config", cfg_path, "--resume"]) == 0

    # pure inference: label file -> wav, no acoustic targets involved
    lab = os.path.join(corpus, "label_state_align", "demo0000.lab")
    assert cli_main(["synth", "--config", cfg_path, lab]) == 0
    wav = os.path.join(workdir, "synth", "demo0000.wav")
    assert os.path.getsize(wav) > 1000


def test_train_preset_production(corpus, tmp_path):
    """--preset production overlays the measured-best bundle (EMA 0.995,
    device corpus, GV-aware selection for measured WGAN runs) and the
    workdir config dump records the EFFECTIVE settings."""
    workdir = str(tmp_path / "exp")
    cfg_path = _write_cfg(
        corpus,
        workdir,
        train={
            "trainer": "wgan", "epochs": 1, "n_critic": 2,
            "measures_every": 1, "checkpoint_every": 1,
        },
    )
    assert cli_main(["train", "--config", cfg_path, "--preset", "production"]) == 0
    eff = Configuration.load(os.path.join(workdir, "config.json"))
    assert eff.train.ema_decay == 0.995
    assert eff.train.device_corpus is True
    assert eff.train.best_metric == "mcd_gv"
    # generation from the RAW config (ema_decay=0) must still open the
    # preset-trained checkpoint, whose pytree carries the EMA branch —
    # CheckpointManager.restore reconciles the optional EMA slot with the
    # on-disk tree (and eval_params then serves the EMA weights)
    assert cli_main(["generate", "--config", cfg_path, "--no-wav"]) == 0
    with open(os.path.join(workdir, "measures.json")) as f:
        m = json.load(f)
    assert np.isfinite(m["mcd_db"])


def test_apply_preset_world_vuv_rule():
    """The production preset flips WORLD runs to the nm-derived voicing
    rule (vuv_rule='bap', measured 4.30% → 1.99% test VUV) while leaving
    PML configs' vocoder untouched and respecting an explicit user
    choice; unknown preset names raise."""
    import dataclasses

    from percivaltts_tpu.cli import apply_preset
    from percivaltts_tpu.config import Configuration, VocoderConfig

    base = Configuration()
    world = base.replace(vocoder=VocoderConfig(kind="world"))
    eff = apply_preset(world, "production")
    assert eff.vocoder.vuv_rule == "bap"
    assert eff.train.ema_decay == 0.995

    pml = apply_preset(base, "production")
    # PML runs get the prediction-path voicing calibration (test VUV
    # 2.69% → 0.95% on the matched d4c soak); analysis rule untouched
    assert pml.vocoder.vuv_pred_low_frac == 0.65
    assert pml.vocoder.vuv_pred_threshold == 0.60
    assert pml.vocoder.analysis == base.vocoder.analysis
    assert pml.vocoder.vuv_rule == base.vocoder.vuv_rule

    # an explicit user setting survives the overlay
    explicit = world.replace(
        vocoder=dataclasses.replace(world.vocoder, vuv_rule="bap",
                                    vuv_bap_threshold=0.6)
    )
    assert apply_preset(explicit, "production").vocoder.vuv_bap_threshold == 0.6
    explicit_pml = base.replace(
        vocoder=dataclasses.replace(base.vocoder, vuv_pred_threshold=0.5)
    )
    eff_pml = apply_preset(explicit_pml, "production")
    assert eff_pml.vocoder.vuv_pred_threshold == 0.5
    assert eff_pml.vocoder.vuv_pred_low_frac is None

    with pytest.raises(ValueError, match="preset"):
        apply_preset(base, "nope")
