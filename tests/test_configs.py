"""Config system and scene-preset registry tests."""

import json
import os

import pytest

from consistentnerf_tpu.configs import Config, load_config, parse_overrides
from consistentnerf_tpu.configs import scenes


def test_override_parsing_types():
    cfg = Config()
    cfg = parse_overrides(cfg, [
        "N_rand=128", "lrate=0.001", "hardmask=true",
        'expname="abc"', "depthdir=None",
    ])
    assert cfg.N_rand == 128
    assert cfg.lrate == pytest.approx(0.001)
    assert cfg.hardmask is True
    assert cfg.expname == "abc"
    assert cfg.depthdir is None


def test_unknown_override_rejected():
    with pytest.raises(KeyError):
        parse_overrides(Config(), ["bogus=1"])


def test_config_json_roundtrip(tmp_path):
    cfg = Config(N_rand=99, expname="rt", hardmask=True)
    path = str(tmp_path / "c.json")
    cfg.save(path)
    back = load_config(path)
    assert back.N_rand == 99
    assert back.expname == "rt"
    assert back.hardmask is True


def test_config_file_unknown_field_rejected(tmp_path):
    path = str(tmp_path / "bad.json")
    with open(path, "w") as f:
        json.dump({"not_a_field": 1}, f)
    with pytest.raises(KeyError):
        load_config(path)


def test_preset_registry_size_and_grid():
    names = scenes.list_scenes()
    # (8 blender + 8 llff + 13 dtu) scenes x 3 view-counts, x 2 mip
    # variants, + 2 dataset-free proof-of-life presets
    assert len(names) == 29 * 3 + 29 * 2 + 2
    assert "lego_3view" in names
    assert "regnerf3_llff_fern" in names
    assert "mipnerf3_dtu_scan114" in names
    assert "synthetic_pol" in names and "synthetic_pol_mip" in names


def test_vanilla_preset_reference_hparams():
    cfg = scenes.get_scene_config("fern_3view")
    # run_nerf_view.py defaults + alky/jobs1.sh setting
    assert cfg.N_rand == 4096
    assert cfg.N_samples == 64 and cfg.N_importance == 128
    assert cfg.lrate == pytest.approx(5e-4)
    assert cfg.hardmask and cfg.with_depth_loss
    assert cfg.grad_max_val == pytest.approx(0.1)
    assert cfg.dataset_type == "llff" and cfg.factor == 4


def test_regnerf_preset_gin_hparams():
    cfg = scenes.get_scene_config("regnerf3_dtu_scan114")
    # configs/regnerf3/dtu/scan114_3.gin transcription
    assert cfg.total_iters == 43945
    assert cfg.lr_init == pytest.approx(2e-3)
    assert cfg.lr_delay_steps == 512
    assert cfg.depth_tvnorm_decay
    assert cfg.depth_tvnorm_loss_mult_start == pytest.approx(400.0)
    assert cfg.anneal_nearfar and cfg.anneal_nearfar_steps == 256
    assert cfg.near == pytest.approx(0.5) and cfg.far == pytest.approx(3.5)
    assert cfg.dtu_split_type == "masknerf"


def test_mipnerf_baseline_no_random_rays():
    cfg = scenes.get_scene_config("mipnerf3_nerf_lego")
    assert not cfg.load_random_rays  # "For BL" (mipnerf3 gin)
    assert cfg.white_bkgd


def test_llff_preset_cylinder_rays():
    cfg = scenes.get_scene_config("regnerf3_llff_fern")
    assert cfg.ray_shape == "cylinder"


def test_export_configs_cli(tmp_path):
    from consistentnerf_tpu.cli.export_configs import main

    main([str(tmp_path)])
    assert (tmp_path / "configs_3view" / "lego.json").is_file()
    assert (tmp_path / "configs_16view" / "fern.json").is_file()
    assert (tmp_path / "configs" / "regnerf3" / "dtu_scan114.json").is_file()
    cfg = load_config(str(tmp_path / "configs_3view" / "lego.json"))
    assert cfg.train_view_num == 3


def test_override_python_style_booleans():
    """`--set hardmask=False` must coerce to bool(False), not the TRUTHY
    string "False" (json.loads only accepts lowercase) — this silently
    inverted a measurement run's flags (RUNS_r5.md)."""
    from consistentnerf_tpu.configs import Config, parse_overrides

    c = parse_overrides(Config(hardmask=True), ["hardmask=False"])
    assert c.hardmask is False
    c = parse_overrides(Config(), ["hardmask=TRUE", "softmask=false"])
    assert c.hardmask is True and c.softmask is False
    # Plain strings still pass through.
    c = parse_overrides(Config(), ["expname=Falsehood"])
    assert c.expname == "Falsehood"
