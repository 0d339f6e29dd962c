"""AOT trace cache (utils/aot.py): disk round-trip equivalence with plain
jit, cross-"process" reload (fresh wrapper instance), and graceful
fallback on corrupt entries."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke


@pytest.fixture()
def aot_env(tmp_path, monkeypatch):
    monkeypatch.setenv("ZKLC_AOT", "1")
    monkeypatch.setenv("ZKLC_AOT_CACHE", str(tmp_path))
    yield tmp_path


def _fn(x, y):
    import jax.numpy as jnp
    return jnp.dot(x, y) + x.sum()


def test_aot_jit_matches_plain_jit(aot_env):
    import jax
    from zklc_tpu.utils.aot import aot_jit
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    y = np.arange(20, dtype=np.float32).reshape(4, 5)
    got = aot_jit(_fn, "test|dot")(x, y)
    want = jax.jit(_fn)(x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    assert len(list(aot_env.glob("*.jaxexp"))) == 1


def test_aot_reload_from_disk(aot_env):
    from zklc_tpu.utils.aot import aot_jit
    x = np.ones((4, 4), np.float32)
    first = aot_jit(_fn, "test|reload")
    a = np.asarray(first(x, x))
    # a fresh wrapper (new process analogue) must hit the disk entry
    second = aot_jit(_fn, "test|reload")
    b = np.asarray(second(x, x))
    np.testing.assert_allclose(a, b)
    files = list(aot_env.glob("*.jaxexp"))
    assert len(files) == 1


def test_aot_corrupt_entry_falls_back(aot_env, capsys):
    from zklc_tpu.utils.aot import aot_jit
    x = np.ones((2, 2), np.float32)
    aot_jit(_fn, "test|corrupt")(x, x)
    (entry,) = aot_env.glob("*.jaxexp")
    entry.write_bytes(b"garbage")
    got = np.asarray(aot_jit(_fn, "test|corrupt")(x, x))
    np.testing.assert_allclose(got, np.asarray(_fn(x, x)))
    assert "reload failed" in capsys.readouterr().out


def test_aot_export_disabled_reload_only(aot_env, monkeypatch):
    """ZKLC_AOT_EXPORT=0: a miss runs plain jit and writes NOTHING; a
    pre-existing entry is still reloaded (deadline-bound bench children)."""
    from zklc_tpu.utils.aot import aot_jit
    x = np.ones((3, 3), np.float32)
    # populate the cache with export allowed
    a = np.asarray(aot_jit(_fn, "test|exp")(x, x))
    assert len(list(aot_env.glob("*.jaxexp"))) == 1
    monkeypatch.setenv("ZKLC_AOT_EXPORT", "0")
    # hit: reload still works
    b = np.asarray(aot_jit(_fn, "test|exp")(x, x))
    np.testing.assert_allclose(a, b)
    # miss (different key): plain jit, no new entry on disk
    c = np.asarray(aot_jit(_fn, "test|exp-miss")(x, x))
    np.testing.assert_allclose(a, c)
    assert len(list(aot_env.glob("*.jaxexp"))) == 1


def test_aot_disabled_on_cpu_by_default(tmp_path, monkeypatch):
    import jax
    monkeypatch.delenv("ZKLC_AOT", raising=False)
    monkeypatch.setenv("ZKLC_AOT_CACHE", str(tmp_path))
    from zklc_tpu.utils import aot
    if jax.default_backend() == "cpu":
        assert not aot.enabled()
        aot.aot_jit(_fn, "test|off")(np.ones((2, 2), np.float32),
                                     np.ones((2, 2), np.float32))
        assert list(tmp_path.glob("*.jaxexp")) == []
