import json
import os

import numpy as np
import pytest

from percivaltts_tpu.cli import main as cli_main
from percivaltts_tpu.config import Configuration, VocoderConfig


def test_measures_subcommand(tmp_path, capsys):
    cfg = Configuration(
        workdir=str(tmp_path / "exp"),
        vocoder=VocoderConfig(spec_size=17, nm_size=9),
    )
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg.to_dict(), f)
    dim = cfg.vocoder.feature_size
    rng = np.random.default_rng(0)
    ref_dir, pred_dir = tmp_path / "ref", tmp_path / "pred"
    ref_dir.mkdir(), pred_dir.mkdir()
    for i in range(3):
        feats = rng.normal(size=(40, dim)).astype(np.float32)
        feats[:, 0] = np.log(140.0)
        feats.tofile(str(ref_dir / f"u{i}.cmp"))
        (feats + 0.02 * rng.normal(size=feats.shape).astype(np.float32)).tofile(
            str(pred_dir / f"u{i}.cmp")
        )
    rc = cli_main(
        ["measures", "--config", cfg_path, "--ref", str(ref_dir), "--pred", str(pred_dir)]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["files"] == 3
    assert 0 < out["mcd_db"] < 2.0  # small perturbation → small MCD
    assert "f0_rmse_hz" in out

    # identical dirs → zero distortion
    rc = cli_main(
        ["measures", "--config", cfg_path, "--ref", str(ref_dir), "--pred", str(ref_dir)]
    )
    out = json.loads(capsys.readouterr().out)
    assert out["mcd_db"] == 0.0

    with pytest.raises(FileNotFoundError):
        cli_main(["measures", "--config", cfg_path, "--ref", str(tmp_path / "nope"),
                  "--pred", str(pred_dir)])
