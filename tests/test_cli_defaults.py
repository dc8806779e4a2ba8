"""cli.common.auto_fused_defaults policy matrix (CPU backend here, so
the accelerator branch is exercised via monkeypatching the backend)."""

import jax
import pytest

from consistentnerf_tpu.cli import common
from consistentnerf_tpu.configs import Config


class _Args:
    config = None

    def __init__(self, overrides=()):
        self.overrides = list(overrides)


class _FakeTpuDevice:
    platform = "tpu"


def _on_accel(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "devices",
                        lambda *a, **k: [_FakeTpuDevice()])


def test_cpu_backend_keeps_xla_paths():
    cfg = common.auto_fused_defaults(Config(), _Args())
    assert not cfg.use_fused_train and not cfg.use_fused_render


def test_stale_default_backend_keeps_xla_paths(monkeypatch):
    """After a mid-process jax_platforms=cpu switch default_backend() can
    still report the accelerator while jax.devices() is all-CPU; the
    policy must follow the live device list (ADVICE r2)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = common.auto_fused_defaults(Config(), _Args())
    assert not cfg.use_fused_train and not cfg.use_fused_render


def test_mip_requires_stop_level_grad(monkeypatch):
    """The fused mip VJP drops level-2 -> level-1 sample gradients, so
    auto-enable must require stop_level_grad (ADVICE r2)."""
    _on_accel(monkeypatch)
    off = common.auto_fused_defaults(
        Config(backbone="mipnerf", disable_normals=True,
               stop_level_grad=False), _Args()
    )
    assert not off.use_fused_train


def test_accel_enables_fused_vanilla(monkeypatch):
    _on_accel(monkeypatch)
    cfg = common.auto_fused_defaults(Config(), _Args())
    assert cfg.use_fused_train and cfg.fused_tile == 1024
    assert not cfg.use_fused_render  # fp32 default -> XLA render


def test_accel_bf16_enables_fused_render(monkeypatch):
    _on_accel(monkeypatch)
    cfg = common.auto_fused_defaults(
        Config(compute_dtype="bfloat16"), _Args()
    )
    assert cfg.use_fused_train and cfg.use_fused_render


def test_explicit_override_wins(monkeypatch):
    _on_accel(monkeypatch)
    cfg = common.auto_fused_defaults(
        Config(), _Args(["use_fused_train=false"])
    )
    assert not cfg.use_fused_train


def test_explicit_tile_respected(monkeypatch):
    _on_accel(monkeypatch)
    cfg = common.auto_fused_defaults(
        Config(fused_tile=512), _Args(["fused_tile=512"])
    )
    assert cfg.use_fused_train and cfg.fused_tile == 512


def test_mip_requires_disable_normals(monkeypatch):
    _on_accel(monkeypatch)
    on = common.auto_fused_defaults(
        Config(backbone="mipnerf", disable_normals=True), _Args()
    )
    assert on.use_fused_train
    off = common.auto_fused_defaults(
        Config(backbone="mipnerf", disable_normals=False), _Args()
    )
    assert not off.use_fused_train


def test_high_multires_falls_back_to_xla(monkeypatch):
    _on_accel(monkeypatch)
    cfg = common.auto_fused_defaults(Config(multires=21), _Args())
    assert not cfg.use_fused_train


def test_mip_normals_gets_fused_render_not_train(monkeypatch):
    """disable_normals=False: the render path computes normals in-kernel
    (fused_mip_mlp_normals_T) so fused RENDER still auto-enables, but the
    TRAIN step (no VJP for the normals forward) stays XLA."""
    _on_accel(monkeypatch)
    cfg = common.auto_fused_defaults(
        Config(backbone="mipnerf", disable_normals=False,
               compute_dtype="bfloat16"), _Args()
    )
    assert cfg.use_fused_render and not cfg.use_fused_train


def test_mip_gets_onepass_default(monkeypatch):
    """The mip backbone picks up use_onepass_train with the fused-train
    default; train/loop falls back when mip_onepass_supported is false."""
    _on_accel(monkeypatch)
    cfg = common.auto_fused_defaults(
        Config(backbone="mipnerf", disable_normals=True), _Args()
    )
    assert cfg.use_fused_train and cfg.use_onepass_train


def test_accel_enables_onepass_train(monkeypatch):
    """Accelerator defaults turn on the one-pass megakernel step (the
    48.6 vs 60.3 ms flagship winner); explicit override wins."""
    _on_accel(monkeypatch)
    cfg = common.auto_fused_defaults(Config(), _Args())
    assert cfg.use_fused_train and cfg.use_onepass_train
    off = common.auto_fused_defaults(
        Config(), _Args(["use_onepass_train=false"])
    )
    assert off.use_fused_train and not off.use_onepass_train


def test_onepass_follows_explicit_fused_train(monkeypatch):
    """use_fused_train set explicitly true still picks up the megakernel
    default; use_fused_train=false suppresses it."""
    _on_accel(monkeypatch)
    on = common.auto_fused_defaults(
        Config(use_fused_train=True), _Args(["use_fused_train=true"])
    )
    assert on.use_onepass_train
    off = common.auto_fused_defaults(
        Config(), _Args(["use_fused_train=false"])
    )
    assert not off.use_onepass_train


class _StepArgs(_Args):
    def __init__(self, num_steps=None, overrides=()):
        super().__init__(overrides)
        self.num_steps = num_steps


def test_schedule_horizon_adapts_to_num_steps():
    """Queue-J regression (RUNS_r4.md §10): `--num-steps 3000` against the
    50k default total_iters left lr pinned at lr_init=2e-3 and diverged on
    hardware. When total_iters is not explicit, the horizon must follow
    --num-steps and the step-denominated schedule knobs rescale."""
    cfg = Config(backbone="mipnerf", anneal_nearfar=True)
    out = common.reconcile_schedule_horizon(cfg, _StepArgs(3000))
    assert out.total_iters == 3000
    # anneal 2000/50000 and lr_delay 512/50000 keep their proportions.
    assert out.anneal_nearfar_steps == 120
    assert out.lr_delay_steps == 31
    # The lr actually decays across the run now.
    from consistentnerf_tpu.train.state import make_lr_schedule

    sched = make_lr_schedule(out)
    assert float(sched(2999)) < 0.02 * float(sched(out.lr_delay_steps + 1))


def test_schedule_horizon_explicit_total_iters_warns():
    import warnings

    cfg = Config(backbone="mipnerf", total_iters=50000)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = common.reconcile_schedule_horizon(
            cfg, _StepArgs(3000, ["total_iters=50000"])
        )
    assert out.total_iters == 50000  # explicit horizon is honored
    assert any("diverged on hardware" in str(x.message) for x in w)


def test_schedule_horizon_noop_when_matching():
    cfg = Config(total_iters=8000)
    out = common.reconcile_schedule_horizon(cfg, _StepArgs(8000))
    assert out is cfg
    out = common.reconcile_schedule_horizon(cfg, _StepArgs(None))
    assert out is cfg


def test_schedule_horizon_respects_explicit_anneal():
    cfg = Config(backbone="mipnerf", anneal_nearfar=True,
                 anneal_nearfar_steps=256)
    out = common.reconcile_schedule_horizon(
        cfg, _StepArgs(3000, ["anneal_nearfar_steps=256"])
    )
    assert out.total_iters == 3000
    assert out.anneal_nearfar_steps == 256


def test_ice_guard_reroutes_3264_xla(monkeypatch):
    """RUNS_r4.md F4: the pure-XLA vanilla train step at 32c+64f crashes
    the libtpu register allocator. On TPU the config layer must reroute
    to the fused step (which compiles) instead of dumping a RET_CHECK."""
    _on_accel(monkeypatch)
    monkeypatch.delenv("CNERF_ALLOW_ICE_SHAPES", raising=False)
    cfg = Config(N_samples=32, N_importance=64, use_fused_train=False)
    out = common.guard_known_compiler_ice(cfg)
    assert out.use_fused_train and out.use_onepass_train

    # Other shapes are untouched.
    ok = Config(N_samples=64, N_importance=128, use_fused_train=False)
    assert common.guard_known_compiler_ice(ok) is ok


def test_ice_guard_unfusible_errors_actionably(monkeypatch):
    _on_accel(monkeypatch)
    monkeypatch.delenv("CNERF_ALLOW_ICE_SHAPES", raising=False)
    cfg = Config(N_samples=32, N_importance=64, multires=21)
    with pytest.raises(RuntimeError, match="live_range_finder"):
        common.guard_known_compiler_ice(cfg)


def test_ice_guard_escape_hatch(monkeypatch):
    _on_accel(monkeypatch)
    monkeypatch.setenv("CNERF_ALLOW_ICE_SHAPES", "1")
    cfg = Config(N_samples=32, N_importance=64)
    assert common.guard_known_compiler_ice(cfg) is cfg


def test_ice_guard_noop_on_cpu():
    cfg = Config(N_samples=32, N_importance=64)
    assert common.guard_known_compiler_ice(cfg) is cfg
