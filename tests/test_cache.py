"""Zero-config persistent caches (cache.py, round 4).

The reference's kernel cache is zero-config and keyed by program text
(jit.cu:1239-1331). Ours layers a version-keyed export-artifact cache
and the XLA persistent compile cache under ~/.cache/enoki_tpu with LRU
size bounding; these tests pin the resolution rules and the eviction
policy (the end-to-end artifact round trip is tests/test_trace.py's
export-cache tests and the on-chip drive flow)."""

import os

import jax
import pytest

from enoki_tpu import cache
from enoki_tpu.config import config


@pytest.fixture
def restore_cfg():
    d, b = config.trace_export_dir, config.cache_max_bytes
    yield
    config.trace_export_dir = d
    config.cache_max_bytes = b


def test_export_dir_auto_is_version_keyed(restore_cfg):
    config.trace_export_dir = "auto"
    d = cache.export_dir()
    assert d.endswith(cache.version_tag())
    assert os.path.join(".cache", "enoki_tpu", "export") in d
    # tag invalidates on version / jax / platform change
    import enoki_tpu

    tag = cache.version_tag()
    assert enoki_tpu.__version__ in tag
    assert jax.__version__ in tag
    assert jax.default_backend() in tag


@pytest.mark.parametrize("word", ["off", "OFF", "none", "0", ""])
def test_export_dir_disable_words(restore_cfg, word):
    config.trace_export_dir = word
    assert cache.export_dir() == ""


def test_export_dir_literal_path(restore_cfg, tmp_path):
    config.trace_export_dir = str(tmp_path)
    assert cache.export_dir() == str(tmp_path)


def test_evict_lru_drops_oldest_first(tmp_path):
    for i in range(6):
        p = tmp_path / f"f{i}.jaxexp"
        p.write_bytes(b"x" * 100)
        os.utime(p, (i * 10, i * 10))
    cache.evict_lru(str(tmp_path), 300)
    kept = sorted(p.name for p in tmp_path.iterdir())
    assert kept == ["f3.jaxexp", "f4.jaxexp", "f5.jaxexp"]


def test_evict_lru_noop_under_bound(tmp_path):
    (tmp_path / "a").write_bytes(b"x" * 10)
    cache.evict_lru(str(tmp_path), 1 << 20)
    assert (tmp_path / "a").exists()


def test_evict_lru_missing_dir_is_silent(tmp_path):
    cache.evict_lru(str(tmp_path / "nope"), 10)  # must not raise


def test_export_write_triggers_eviction(restore_cfg, tmp_path, monkeypatch):
    """An export-cache artifact write respects the size bound: seed the
    dir over budget with old files, run one lazy program through the
    export path, and check the stale files went away while the fresh
    artifact stays."""
    from enoki_tpu import trace

    config.trace_export_dir = str(tmp_path)
    config.cache_max_bytes = 4096
    stale = tmp_path / "00deadbeef.jaxexp"
    stale.write_bytes(b"x" * 8192)
    os.utime(stale, (1, 1))
    try:
        x = trace.LazyArray.arange(64)
        y = (x * 2 + 1).cast("float32")
        y.eval()
        names = [p.name for p in tmp_path.iterdir()]
        assert "00deadbeef.jaxexp" not in names, names
        assert any(n.endswith(".jaxexp") for n in names), names
    finally:
        config.trace_export_dir = ""


def test_compile_cache_env_off_respected():
    # conftest sets ENOKI_TPU_COMPILE_CACHE=off for hermeticity; the
    # import-time hook must therefore have left jax unconfigured
    assert os.environ.get("ENOKI_TPU_COMPILE_CACHE") == "off"
    assert not jax.config.jax_compilation_cache_dir
