"""Program-cache bundles (runtime/aotcache.py): the cold-start story.

Reference behavior being re-provided: the C++ node is compute-ready at
process start (ros2/src/fastdem_ros_node.cpp); here the compiled XLA
executables ship as a cache bundle so a restarted node skips first-run
compiles. These tests run on the CPU backend (conftest) — the mechanism
(persistent compilation cache + manifest) is backend-agnostic.
"""

import json
import os

import numpy as np
import pytest

from fastdem_tpu.config.config import Config, PostProcessConfig
from fastdem_tpu.grid.geometry import GridGeometry
from fastdem_tpu.runtime import aotcache


@pytest.fixture()
def geom():
    return GridGeometry.from_length(6.0, 6.0, 0.1)


def test_warmup_populates_bundle_and_manifest(tmp_path, geom):
    bundle = str(tmp_path / "bundle")
    cfg = Config()
    manifest = aotcache.warmup(
        geom, cfg, PostProcessConfig(), bundle_dir=bundle,
        capacities=(4096,), replay_batches=(2,),
    )
    assert os.path.exists(os.path.join(bundle, aotcache.MANIFEST))
    progs = {p["program"] for p in manifest["programs"]}
    assert progs == {"integrate", "integrate_sequence", "postprocess"}
    assert manifest["warmup_seconds"] > 0
    # Cache entries were actually written (at least one compile > 0.5 s
    # would be needed; on fast CPU compiles entries may be few, but the
    # manifest must round-trip regardless).
    health = aotcache.verify(bundle)
    assert health["fingerprint"] == manifest["fingerprint"]
    assert health["toolchain_drift"] == {}


def test_enable_warns_on_toolchain_drift(tmp_path, geom, caplog):
    bundle = str(tmp_path / "bundle")
    os.makedirs(bundle)
    manifest = {
        "fingerprint": "abc",
        "toolchain": {"jax": "0.0.1", "platform": "tpu",
                      "device_kind": "v99"},
    }
    with open(os.path.join(bundle, aotcache.MANIFEST), "w") as f:
        json.dump(manifest, f)
    with caplog.at_level("WARNING", logger="fastdem_tpu.aotcache"):
        out = aotcache.enable(bundle)
    assert out["fingerprint"] == "abc"
    assert any("will miss and recompile" in r.message for r in caplog.records)
    health = aotcache.verify(bundle)
    assert set(health["toolchain_drift"]) >= {"jax", "platform"}


def test_fingerprint_sensitivity(geom):
    cfg = Config()
    fp1 = aotcache.fingerprint(geom, cfg, None, (4096,))
    assert fp1 == aotcache.fingerprint(geom, cfg, None, (4096,))
    cfg2 = Config()
    cfg2.mapping.kalman.process_noise = cfg2.mapping.kalman.process_noise + 1e-3
    assert fp1 != aotcache.fingerprint(geom, cfg2, None, (4096,))
    assert fp1 != aotcache.fingerprint(geom, cfg, None, (8192,))
    geom2 = GridGeometry.from_length(8.0, 6.0, 0.1)
    assert fp1 != aotcache.fingerprint(geom2, cfg, None, (4096,))
