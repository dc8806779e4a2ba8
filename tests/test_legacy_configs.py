"""Reference experiment-file ingestion (configs/legacy.py).

Fixture files are hand-written in the reference's two formats (the gin
binding style of `RegNeRF/configs/**.gin` and the configargparse style
of `run_nerf_view.py:672-808` `--config`); field values mirror the
checked-in `regnerf3/dtu/scan114_3.gin` grid entry so the import can be
cross-checked against the native preset transcribed from the same file.
"""

import os

from consistentnerf_tpu.configs import (Config, config_file_keys,
                                        load_config)
from consistentnerf_tpu.configs import legacy

SCAN114_GIN = """
# DTU settings
Config.data_dir = "data/DTU/Rectified/"
Config.dtu_mask_path = 'data/submission_data'
Config.checkpoint_dir = "out/dtu3_114"
Config.dtu_scan = "scan114"
Config.dataset_loader = 'dtu'
Config.white_background = False
Config.near = 0.5
Config.far = 3.5
Config.factor = 2
Config.render_factor = 2
Config.dtu_split_type = 'masknerf'
MLP.density_noise = 1.

Config.n_input_views = 3
Config.max_steps = 43945

Config.lr_init = 0.002
Config.lr_final = 0.00002
Config.lr_delay_steps = 512
Config.lr_delay_mult = 0.01
Config.grad_max_norm = 0.1
Config.grad_max_val = 0.1

Config.anneal_nearfar = True
Config.anneal_nearfar_steps = 256
Config.anneal_nearfar_perc = 0.5

Config.depth_tvnorm_loss_mult = 0.1
Config.depth_tvnorm_decay = True
Config.depth_tvnorm_maxstep = 512
Config.depth_tvnorm_loss_mult_start = 400.0
Config.depth_tvnorm_loss_mult_end = 0.1

Config.flow_loss_mult = 0.0
Config.depth_tvnorm_mask_weight = 1.0
"""

LEGO_TXT = """
expname = blender_paper_lego
basedir = ./logs
datadir = ./data/nerf_synthetic/lego
dataset_type = blender

no_batching = True
use_viewdirs = True
white_bkgd = True
lrate_decay = 500

N_samples = 64
N_importance = 128
N_rand = 1024
chunk = 16384
netchunk = 65536

precrop_iters = 500
precrop_frac = 0.5
half_res = True
"""


def _write(tmp_path, name, text):
    p = os.path.join(tmp_path, name)
    with open(p, "w") as f:
        f.write(text)
    return p


class TestGinImport:
    def test_scan114_fields(self, tmp_path):
        path = _write(str(tmp_path), "scan114_3.gin", SCAN114_GIN)
        cfg = load_config(path)
        assert cfg.backbone == "mipnerf"
        # data_dir + dtu_scan -> {root}/{scan} with Rectified dropped
        # (native DTU loader keeps Rectified under root, data/dtu.py).
        assert cfg.datadir == os.path.join("data", "DTU", "scan114")
        assert cfg.dtu_mask_path == "data/submission_data"
        assert cfg.basedir == "out" and cfg.expname == "dtu3_114"
        assert cfg.dataset_type == "dtu"
        assert cfg.white_bkgd is False
        assert (cfg.near, cfg.far) == (0.5, 3.5)
        assert cfg.factor == 2 and cfg.render_factor == 2
        assert cfg.dtu_split_type == "masknerf"
        assert cfg.density_noise == 1.0  # MLP scope
        assert cfg.train_view_num == 3
        assert cfg.total_iters == 43945
        assert cfg.lr_init == 2e-3 and cfg.lr_final == 2e-5
        assert cfg.lr_delay_steps == 512 and cfg.lr_delay_mult == 0.01
        assert cfg.grad_max_norm == 0.1 and cfg.grad_max_val == 0.1
        assert cfg.anneal_nearfar is True
        assert cfg.anneal_nearfar_steps == 256
        assert cfg.anneal_nearfar_perc == 0.5
        assert cfg.depth_tvnorm_loss_mult == 0.1
        assert cfg.depth_tvnorm_decay is True
        assert cfg.depth_tvnorm_maxstep == 512
        assert cfg.depth_tvnorm_loss_mult_start == 400.0
        assert cfg.depth_tvnorm_loss_mult_end == 0.1
        assert cfg.depth_tvnorm_mask_weight == 1.0

    def test_matches_native_preset_semantics(self, tmp_path):
        """The import of the scan114-style file agrees with the preset
        transcribed from the same grid entry on the shared fields."""
        from consistentnerf_tpu.configs import scenes

        path = _write(str(tmp_path), "scan114_3.gin", SCAN114_GIN)
        imported = load_config(path)
        preset = scenes.get_scene_config("regnerf3_dtu_scan114")
        shared = [
            "backbone", "dataset_type", "white_bkgd", "near", "far",
            "factor", "render_factor", "dtu_split_type", "train_view_num",
            "total_iters", "lr_init", "lr_final", "lr_delay_steps",
            "lr_delay_mult", "grad_max_norm", "grad_max_val",
            "anneal_nearfar", "anneal_nearfar_steps", "anneal_nearfar_perc",
            "depth_tvnorm_loss_mult", "depth_tvnorm_decay",
            "depth_tvnorm_maxstep", "depth_tvnorm_loss_mult_start",
            "depth_tvnorm_loss_mult_end", "depth_tvnorm_mask_weight",
            "density_noise", "N_rand", "n_patches", "patch_size",
            "batch_size_random", "random_patch_size", "load_random_rays",
            "mip_num_samples", "mip_num_levels",
        ]
        for name in shared:
            assert getattr(imported, name) == getattr(preset, name), name

    def test_reference_defaults_seeded(self, tmp_path):
        """Fields the file omits take the REFERENCE defaults, not ours."""
        path = _write(str(tmp_path), "minimal.gin",
                      'Config.dataset_loader = "blender"\n'
                      'Config.blender_scene = "lego"\n'
                      'Config.data_dir = "data/nerf_synthetic"\n')
        cfg = load_config(path)
        assert cfg.datadir == os.path.join("data", "nerf_synthetic", "lego")
        assert cfg.expname == "minimal"  # filename stem fallback
        assert cfg.total_iters == 50002  # configs.py:125
        assert cfg.lr_init == 5e-4 and cfg.lr_delay_steps == 0
        assert cfg.white_bkgd is True  # configs.py:91
        assert cfg.factor == 0
        assert cfg.load_random_rays is True
        assert cfg.train_render_every == 2000
        assert cfg.N_rand == 1024 and cfg.n_patches == 4
        assert cfg.patch_size == 16

    def test_dead_reference_keys_ignored(self):
        updates, ignored = legacy.gin_overrides(
            "Config.flow_loss_mult = 0.0\n"
            "Config.use_flow_depth = True\n"
            "Config.batch_size = 2048\n"
            "Config.near = 1.5\n"
        )
        assert updates == {"near": 1.5}
        assert sorted(ignored) == ["batch_size", "flow_loss_mult",
                                   "use_flow_depth"]

    def test_comment_inside_string(self):
        updates, _ = legacy.gin_overrides(
            "Config.dtu_mask_path = 'a#b'  # trailing comment\n")
        assert updates["dtu_mask_path"] == "a#b"


class TestTxtImport:
    def test_lego_txt(self, tmp_path):
        path = _write(str(tmp_path), "lego.txt", LEGO_TXT)
        cfg = load_config(path)
        assert cfg.backbone == "vanilla"
        assert cfg.expname == "blender_paper_lego"
        assert cfg.basedir == "./logs"
        assert cfg.datadir == "./data/nerf_synthetic/lego"
        assert cfg.dataset_type == "blender"
        assert cfg.use_batching is False  # no_batching = True
        assert cfg.use_viewdirs is True
        assert cfg.white_bkgd is True
        assert cfg.lrate_decay == 500
        assert cfg.N_samples == 64 and cfg.N_importance == 128
        assert cfg.N_rand == 1024
        assert cfg.render_chunk_size == 16384  # chunk ->
        assert cfg.precrop_iters == 500 and cfg.precrop_frac == 0.5
        assert cfg.half_res is True
        # Reference defaults carried by Config() where the file is silent.
        assert cfg.lrate == 5e-4 and cfg.multires == 10

    def test_ignored_and_bare_flags(self):
        updates, ignored = legacy.txt_overrides(
            "ft_path = ./logs/x.tar\n"
            "netchunk = 65536\n"
            "no_reload = True\n"
            "hardmask\n"  # bare store_true flag
            "with_depth_loss = True\n"
        )
        assert updates == {"hardmask": True, "with_depth_loss": True}
        assert sorted(ignored) == ["ft_path", "netchunk", "no_reload"]

    def test_overrides_stack_on_file(self, tmp_path):
        path = _write(str(tmp_path), "lego.txt", LEGO_TXT)
        cfg = load_config(path, ["N_rand=4096"])
        assert cfg.N_rand == 4096
        assert cfg.expname == "blender_paper_lego"


class TestConfigFileKeys:
    def test_gin_keys_include_seeded_base(self, tmp_path):
        path = _write(str(tmp_path), "s.gin",
                      "Config.near = 1.0\nConfig.white_background = False\n")
        keys = config_file_keys(path)
        assert {"near", "white_bkgd"} <= keys
        # Seeded reference defaults count as file-determined so the CLI
        # auto-defaults (cli/common.py) never override them.
        assert {"backbone", "N_rand", "load_random_rays"} <= keys

    def test_txt_keys(self, tmp_path):
        path = _write(str(tmp_path), "s.txt",
                      "N_rand = 2048\nno_batching = True\nchunk = 8192\n")
        keys = config_file_keys(path)
        assert keys == {"N_rand", "use_batching", "render_chunk_size"}

    def test_json_keys(self, tmp_path):
        cfg = Config(N_rand=123)
        p = os.path.join(str(tmp_path), "c.json")
        with open(p, "w") as f:
            f.write('{"N_rand": 123}')
        assert config_file_keys(p) == {"N_rand"}


REFERENCE_GIN_GLOB = "/root/reference/RegNeRF/configs/*/*/*.gin"


class TestFullReferenceGrid:
    """Every checked-in reference gin file loads (skipped when no
    reference checkout is present)."""

    def test_all_grid_files_load(self):
        import glob

        import pytest

        files = sorted(glob.glob(REFERENCE_GIN_GLOB))
        if not files:
            pytest.skip("reference checkout not present")
        known_dead = set(legacy._GIN_IGNORED)
        for path in files:
            cfg = load_config(path)
            assert cfg.backbone == "mipnerf", path
            assert cfg.datadir, path
            assert cfg.dataset_type in ("dtu", "llff", "blender"), path
            assert cfg.near < cfg.far, path
            assert cfg.expname, path
            with open(path) as f:
                _, ignored = legacy.gin_overrides(f.read())
            assert set(ignored) <= known_dead, (path, ignored)
