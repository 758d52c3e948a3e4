"""The real-weights smoke CLI (VERDICT r3 item 10) runs end-to-end on a
synthetic released-format checkpoint and reports ~0 fp32 deltas — so the day
real weights land, validation is one command that is already proven to work.
"""
import subprocess
import sys

import pytest

from streammind_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native ingest lib not built (test assets)"
)


def test_smoke_cli_on_synthetic_checkpoint(tmp_path):
    import json

    import numpy as np
    import torch

    from test_checkpoint_manifest import _tiny_manifest
    from test_eval_scripts import _write_tokenizer
    from streammind_tpu.config import tiny_streammind_config

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    cfg = tiny_streammind_config()
    (ckpt / "streammind_config.json").write_text(cfg.to_json())
    rng = np.random.default_rng(1)
    sd = {k: torch.tensor(rng.standard_normal(shape).astype(np.float32) * 0.02)
          for k, shape in _tiny_manifest(cfg).items()}
    torch.save(sd, ckpt / "pytorch_model.bin")
    _write_tokenizer(str(ckpt))

    import os

    env = dict(os.environ)
    env["STREAMMIND_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "streammind_tpu.tools.real_weights_smoke",
         "--model-path", str(ckpt), "--max-new-tokens", "4"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"{r.stdout}\n{r.stderr}"
    assert "OK: all deltas within tol" in r.stdout
    # both baseline configs ran and reported their deltas
    line = next(l for l in r.stdout.splitlines() if l.startswith('{"deltas"'))
    deltas = json.loads(line)["deltas"]
    assert deltas["vit_feature_rms"] < 2e-4
    assert deltas["decoder_logits_rms"] < 2e-4
