"""Option-file-driven generic trainer (basicsr train.py parity): the
shipped options/*.yaml parse, build from the registries, and run
training steps at tiny scale."""

import copy
import os

import numpy as np
import pytest

import jax.numpy as jnp

from latentsync_tpu.training.option_trainer import (
    OptionTrainer,
    build_schedule,
    parse_options,
    validate,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny(opt, img=32):
    opt = copy.deepcopy(opt)
    g = opt["network_g"]
    g["img_size"] = img
    g["nf"] = 8
    g["ch_mult"] = [1, 2]
    g["codebook_size"] = 16
    if g["type"] == "CodeFormer":
        g["dim_embd"] = 16
        g["n_head"] = 2
        g["n_layers"] = 1
        g["connect_list"] = []
        g["latent_size"] = (img // 2 ** (len(g["ch_mult"]) - 1)) ** 2
        g["emb_dim"] = 16
    else:
        g["emb_dim"] = 16
        g["attn_resolutions"] = [img // 2]
    # n_layers=4 (the 512² default) underflows a 32² test image to an
    # empty final conv; 2 layers keeps the patch output non-empty
    opt["network_d"] = {"type": "VQGANDiscriminator", "ndf": 8, "n_layers": 2}
    opt["bf16"] = False
    opt["train"]["total_iter"] = 2
    return opt


def _batch_fn(img=32):
    rng = np.random.default_rng(0)

    def fn(step):
        gt = rng.uniform(-1, 1, (2, img, img, 3)).astype(np.float32)
        return {"gt": jnp.asarray(gt), "lq": jnp.asarray(gt * 0.8)}

    return fn


def test_all_shipped_option_files_parse():
    for name in ("vqgan_stage1", "codeformer_stage2", "codeformer_stage3"):
        opt = parse_options(f"{REPO}/options/{name}.yaml")
        assert opt["model_type"] in (
            "VQGANModel", "CodeFormerIdxModel", "CodeFormerJointModel")
        assert "network_g" in opt and "train" in opt


def test_vqgan_option_trainer_runs(tmp_path):
    opt = _tiny(parse_options(f"{REPO}/options/vqgan_stage1.yaml"))
    tr = OptionTrainer(opt, data_source=object(), log_fn=lambda s: None)
    out = tr.run(max_steps=2, img_size=32, output_dir=str(tmp_path / "ck"),
                 batch_fn=_batch_fn())
    assert np.isfinite(out["metrics"]["g"])
    assert np.isfinite(out["metrics"]["d"])
    # EMA tracked separately from the raw params
    assert out["ema_params"] is not None
    ck = list((tmp_path / "ck").iterdir())
    assert ck, "checkpoint saved"


def test_codeformer_stage2_option_trainer_runs():
    opt = _tiny(parse_options(f"{REPO}/options/codeformer_stage2.yaml"))
    tr = OptionTrainer(opt, data_source=object(), log_fn=lambda s: None)
    out = tr.run(max_steps=2, img_size=32, batch_fn=_batch_fn())
    assert all(np.isfinite(v) for v in out["metrics"].values())


def test_schedule_from_option_dict():
    sched = build_schedule(
        {"type": "MultiStepLR", "milestones": [400000, 450000], "gamma": 0.5},
        7.2e-5,
    )
    assert float(sched(0)) == pytest.approx(7.2e-5)
    assert float(sched(400000)) == pytest.approx(3.6e-5)
    assert float(sched(450000)) == pytest.approx(1.8e-5)


def test_validate_metrics():
    from latentsync_tpu.models.codeformer import VQAutoEncoder

    net = VQAutoEncoder(img_size=16, nf=8, ch_mult=(1, 2), codebook_size=16,
                        emb_dim=16, attn_resolutions=(8,))
    import jax

    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    rng = np.random.default_rng(1)
    pairs = [(rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32),
              rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32))]
    out = validate(params, net, pairs, metrics=("psnr",))
    assert np.isfinite(out["psnr"])


def test_tensorboard_logger_writes_events(tmp_path):
    """logger.use_tb_logger emits TensorBoard event files with the
    trained scalars (basicsr train.py:55-69 equivalent)."""
    from latentsync_tpu.training.loggers import build_loggers

    lines = []
    logger = build_loggers({"logger": {"use_tb_logger": True}},
                           str(tmp_path), console=lines.append)
    logger(1, {"l_g_total": 0.5, "note": "not-a-number"})
    logger(2, {"l_g_total": 0.25})
    logger.close()
    tb_dir = tmp_path / "tb_logger"
    events = list(tb_dir.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0
    assert len(lines) == 2 and '"l_g_total": 0.5' in lines[0]

    # scalars actually round-trip
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tb_dir))
    acc.Reload()
    vals = {e.step: e.value for e in acc.Scalars("l_g_total")}
    assert vals == {1: 0.5, 2: 0.25}


def test_build_loggers_without_sinks_is_console_only(tmp_path):
    from latentsync_tpu.training.loggers import build_loggers

    lines = []
    logger = build_loggers({}, str(tmp_path), console=lines.append)
    logger(5, {"loss": 1.0})
    logger.close()
    assert lines == ['{"step": 5, "loss": 1.0}']
    assert not (tmp_path / "tb_logger").exists()
