"""Autotuner mechanics (utils/tune.py) — CPU-runnable.

Timing-based WINNERS are hardware facts (meaningless on CPU); what is
testable everywhere is the machinery: candidate execution, cache
persistence, and cache hits short-circuiting re-timing."""
import json
import os

import jax
import jax.numpy as jnp

from tpuqcd.lattice import Lattice
from tpuqcd.parallel.mesh import LatticeMesh


def test_tune_comm_policy_times_and_caches(tmp_path, monkeypatch,
                                           cpu_devices):
    monkeypatch.setenv("TPUQCD_RESOURCE_PATH", str(tmp_path))
    from tpuqcd.utils.tune import tune_comm_policy

    lat = Lattice((4, 4, 4, 8))
    lmesh = LatticeMesh.make(lat, 2, 1, devices=cpu_devices[:2])
    calls = {"a": 0, "b": 0}

    def make(name, work):
        def fn(b):
            calls[name] += 1
            x = b
            for _ in range(work):
                x = x * 1.000001 + b
            return x
        return fn

    b = jnp.ones((2, 4, 3, 8, 4, 8), jnp.float32)
    w = tune_comm_policy(lat, lmesh, {"a": make("a", 1),
                                      "b": make("b", 200)}, b,
                         tag="test", niter=2)
    assert w in ("a", "b")
    assert calls["a"] > 0 and calls["b"] > 0  # both candidates timed
    cache_file = os.path.join(str(tmp_path), "tunecache.json")
    cache = json.load(open(cache_file))
    (key,) = [k for k in cache if k.startswith("comm_policy/")]
    assert cache[key]["policy"] == w
    assert set(cache[key]["us_per_apply"]) == {"a", "b"}

    # second call: cache hit, no re-timing
    calls["a"] = calls["b"] = 0
    w2 = tune_comm_policy(lat, lmesh, {"a": make("a", 1),
                                       "b": make("b", 200)}, b,
                          tag="test", niter=2)
    assert w2 == w
    assert calls["a"] == 0 and calls["b"] == 0


def test_tune_comm_policy_migrates_legacy_key(tmp_path, monkeypatch,
                                              cpu_devices):
    """Pre-y-mesh cache entries used 'NxM' mesh keys; on an ny == 1
    mesh they must be adopted as 'NxMx1' (no redundant re-timing)."""
    monkeypatch.setenv("TPUQCD_RESOURCE_PATH", str(tmp_path))
    from tpuqcd.utils.tune import tune_comm_policy

    lat = Lattice((4, 4, 4, 8))
    lmesh = LatticeMesh.make(lat, 2, 1, devices=cpu_devices[:2])
    dev = jax.devices()[0]
    legacy = f"comm_policy/{lat.dims}/2x1/test/{dev.device_kind}"
    cache_file = os.path.join(str(tmp_path), "tunecache.json")
    json.dump({legacy: {"policy": "a", "us_per_apply": {}}},
              open(cache_file, "w"))

    calls = {"a": 0, "b": 0}

    def make(name):
        def fn(b):
            calls[name] += 1
            return b * 2.0
        return fn

    b = jnp.ones((2, 4, 3, 8, 4, 8), jnp.float32)
    w = tune_comm_policy(lat, lmesh, {"a": make("a"), "b": make("b")},
                         b, tag="test", niter=2)
    assert w == "a"
    assert calls["a"] == 0 and calls["b"] == 0  # no re-timing
    cache = json.load(open(cache_file))
    assert legacy not in cache                  # migrated, not duplicated
    assert cache[f"comm_policy/{lat.dims}/2x1x1/test/"
                 f"{dev.device_kind}"]["policy"] == "a"
