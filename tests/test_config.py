"""Config round-trip + argparse compilation tests (experiment.py semantics)."""

import argparse

from deftet_tpu.config import (
    Experiment,
    TrainConfig,
    add_config_args,
    config_from_args,
)


def test_json_round_trip(tmp_path):
    cfg = TrainConfig(res=7, lambda_occ=3.5, add_input_noise=False)
    p = tmp_path / "config.json"
    cfg.save(str(p))
    loaded = TrainConfig.load(str(p))
    assert loaded == cfg


def test_unknown_keys_ignored():
    cfg = TrainConfig.from_json('{"res": 9, "some_dead_flag": true}')
    assert cfg.res == 9


def test_bool_flags_expand_to_pairs():
    parser = argparse.ArgumentParser()
    add_config_args(parser)
    args = parser.parse_args(["--no_add_input_noise", "--res", "33"])
    cfg = config_from_args(args)
    assert cfg.add_input_noise is False
    assert cfg.res == 33
    # unspecified flags keep dataclass defaults
    assert cfg.grad_norm is True
    assert cfg.lambda_occ == 10.0


def test_parsed_model_dims():
    cfg = TrainConfig(
        encoder_blocks="8,1,8;16,2,4",
        gcn_hidden="16,8",
        pos_mlp_hidden="8,0.2,4",
    )
    assert cfg.parsed_blocks() == ((8, 1, 8), (16, 2, 4))
    assert cfg.parsed_gcn_hidden() == (16, 8)
    assert cfg.parsed_pos_mlp_hidden() == (8, 0.2, 4)


def test_experiment_new_load(tmp_path):
    cfg = TrainConfig(res=5, logdir=str(tmp_path), experiment_id="abc")
    exp = Experiment.new(cfg)
    assert exp.path.endswith("_abc")
    loaded = Experiment.load(exp.path)
    assert loaded.config.res == 5
    exp.write_state({"epoch": 3, "best_iou": 0.7, "global_step": 99})
    assert loaded.read_state()["global_step"] == 99


def test_reference_compat_flags_accepted():
    """Reference-style invocations with dead flags parse cleanly and do
    not contaminate the config."""
    import argparse

    from deftet_tpu.config import add_config_args, config_from_args

    parser = argparse.ArgumentParser()
    add_config_args(parser)
    args = parser.parse_args([
        "--res", "8", "--use_apex", "--no_use_distributed",
        "--local_rank", "0", "--baseline", "occnet",
        "--use_lap_layer", "--lap_threshold", "0.3",
    ])
    cfg = config_from_args(args)
    assert cfg.res == 8
    assert cfg.use_lap_layer is True
    assert cfg.lap_threshold == 0.3
    assert not hasattr(cfg, "use_apex")
