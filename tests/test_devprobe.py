"""device_reachable gates: forced jax, probe opt-out, cpu-pinned backend
all short-circuit without spawning the probe subprocess; an unreachable
probe downgrades (simulated via a zero timeout and a guaranteed-slow
subprocess)."""
import importlib

import pytest

import xsqueezeit_tpu.utils.devprobe as devprobe


@pytest.fixture(autouse=True)
def _reset_cache():
    """The module caches its verdict per process; leave no poisoned
    cache behind for the rest of the suite (a cached False would route
    every later auto-mode test onto the host path)."""
    yield
    devprobe._cached = None


def _fresh(monkeypatch, **env):
    for k in ("XSI_DEVICE", "XSI_DEVICE_PROBE", "XSI_DEVICE_PROBE_TIMEOUT",
              "XSI_JAX_PLATFORM", "JAX_PLATFORMS"):
        monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    importlib.reload(devprobe)
    return devprobe


def test_forced_jax_short_circuits(monkeypatch):
    d = _fresh(monkeypatch, XSI_DEVICE="jax")
    monkeypatch.setattr("subprocess.run",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("probe subprocess spawned")))
    assert d.device_reachable() is True


def test_probe_opt_out(monkeypatch):
    d = _fresh(monkeypatch, XSI_DEVICE_PROBE="0")
    assert d.device_reachable() is True


def test_cpu_pin_short_circuits(monkeypatch):
    d = _fresh(monkeypatch, XSI_JAX_PLATFORM="cpu")
    assert d.device_reachable() is True
    d = _fresh(monkeypatch, JAX_PLATFORMS="cpu")
    assert d.device_reachable() is True


def test_in_process_accelerator_short_circuits(monkeypatch):
    """A process already holding an initialized non-CPU backend must not
    spawn a probe subprocess: libtpu grants are exclusive, so the
    subprocess would report unreachable for a device that works right
    here (library-caller ordering hazard)."""
    d = _fresh(monkeypatch)
    import sys as _sys
    import types

    fake = types.SimpleNamespace(
        _src=types.SimpleNamespace(
            xla_bridge=types.SimpleNamespace(_backends={"tpu": object()})))
    monkeypatch.setitem(_sys.modules, "jax", fake)
    monkeypatch.setattr("subprocess.run",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("probe subprocess spawned")))
    assert d.device_reachable() is True


def test_probe_failure_reports_reason(monkeypatch, capsys):
    """A probe that FAILS (nonzero exit) must not claim it 'timed out' —
    the stderr tail carries the real reason."""
    d = _fresh(monkeypatch)
    import sys as _sys
    import types

    monkeypatch.setitem(      # only a cpu backend live: no short-circuit
        _sys.modules, "jax",
        types.SimpleNamespace(_src=types.SimpleNamespace(
            xla_bridge=types.SimpleNamespace(_backends={"cpu": object()}))))
    import subprocess as sp

    def fake_run(*a, **k):
        return sp.CompletedProcess(
            a, returncode=1, stdout="",
            stderr="tpu init\nRuntimeError: unable to acquire accelerator")

    monkeypatch.setattr(sp, "run", fake_run)
    assert d.device_reachable() is False
    err = capsys.readouterr().err
    assert "unable to acquire accelerator" in err
    assert "timed out" not in err


def test_unreachable_downgrades_and_caches(monkeypatch, capsys):
    d = _fresh(monkeypatch, XSI_DEVICE_PROBE_TIMEOUT="0.01")
    import subprocess as sp
    calls = []

    def fake_run(*a, **k):
        calls.append(1)
        raise sp.TimeoutExpired(cmd="probe", timeout=0.01)

    monkeypatch.setattr(sp, "run", fake_run)
    assert d.device_reachable() is False
    assert "unreachable" in capsys.readouterr().err
    assert d.device_reachable() is False   # cached: no second spawn
    assert len(calls) == 1
