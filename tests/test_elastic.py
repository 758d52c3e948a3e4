"""Elastic training: resume on a DIFFERENT device mesh.

The reference has no elastic/recovery story for training (SURVEY §5).
Here checkpoints are host npz trees restored through shard_params into
whatever mesh the NEW run brings up, so a job restarts with fewer (or
more) chips — the TPU-native elasticity model: restart + reshard, not
in-flight peer recovery.  Contract: a run broken at step 2 on an
fsdp=8 mesh and resumed on fsdp=4 finishes with the SAME losses as an
unbroken fsdp=8 run (pure sharding change, numerics-equal; data order
replays deterministically).
"""
import dataclasses
import json
import os

import numpy as np

from sp_like_tokenizer import SPLikeTokenizer
from streammind_tpu.config import tiny_streammind_config
from streammind_tpu.train.run import train

from test_train_run import FakeScoreDataset, _args


def _losses(outdir):
    path = os.path.join(outdir, "logs", "metrics.jsonl")
    return [json.loads(l)["train/loss"] for l in open(path)]


def test_resume_on_smaller_mesh(tmp_path):
    cfg = tiny_streammind_config()
    tok = SPLikeTokenizer()
    ds = FakeScoreDataset(tok, cfg)
    ma, da, ta0 = _args(tmp_path, "llm")

    # unbroken reference: 4 steps on fsdp=8
    ref_dir = str(tmp_path / "ref")
    ta_ref = dataclasses.replace(ta0, output_dir=ref_dir, fsdp=8)
    state = train(ma, da, ta_ref, dataset=ds, cfg=cfg)
    assert int(state.step) == 4
    ref_losses = _losses(ref_dir)

    # elastic run: 2 steps on fsdp=8, "lose half the slice", resume fsdp=4
    el_dir = str(tmp_path / "el")
    ta1 = dataclasses.replace(ta0, output_dir=el_dir, fsdp=8)
    train(ma, da, ta1, dataset=ds, cfg=cfg, max_steps_override=2)
    ta2 = dataclasses.replace(ta0, output_dir=el_dir, fsdp=4, dp=1)
    state = train(ma, da, ta2, dataset=ds, cfg=cfg)
    assert int(state.step) == 4

    el_losses = _losses(el_dir)
    # the resumed continuation (steps 3-4) must match the unbroken run —
    # fsdp resharding must not change the math (params AND restored
    # optimizer state land on the new mesh)
    np.testing.assert_allclose(
        el_losses[-2:], ref_losses[-2:], rtol=1e-4, atol=1e-5
    )
