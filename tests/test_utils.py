import io
import logging

import numpy as np

from grayscott_tpu.utils.palette import (
    AMPLITUDE_SCALE,
    MAX_AMPLITUDE,
    colorize,
    inferno_lut,
)
from grayscott_tpu.utils.progress import ProgressBar, _fmt_duration


def test_amplitude_constants():
    # reference: ui/src/lib.rs:115-123
    assert MAX_AMPLITUDE == 0.5
    assert AMPLITUDE_SCALE == 2.0


def test_inferno_lut_shape_and_ends():
    lut = inferno_lut()
    assert lut.shape == (256, 3) and lut.dtype == np.uint8
    assert (lut[0] < 10).all()           # near-black at 0
    assert lut[-1][0] > 200              # bright yellow at 1
    assert inferno_lut(64).shape == (64, 3)


def test_colorize_clamps():
    v = np.asarray([[-1.0, 0.0, 0.5, 10.0]], dtype=np.float32)
    rgb = colorize(v)
    np.testing.assert_array_equal(rgb[0, 0], rgb[0, 1])  # clamped below
    np.testing.assert_array_equal(rgb[0, 2], rgb[0, 3])  # 0.5*2=1 clamped


def test_progress_bar_renders():
    buf = io.StringIO()
    bar = ProgressBar("msg", 10, stream=buf, enabled=True)
    for _ in range(10):
        bar.inc()
    bar.finish()
    out = buf.getvalue()
    assert "msg 10/10" in out and "#" in out


def test_fmt_duration():
    assert _fmt_duration(5) == "5s"
    assert _fmt_duration(65) == "1m05s"
    assert _fmt_duration(3661) == "1h01m01s"


def test_logging_fallback_to_stderr(monkeypatch):
    import grayscott_tpu.utils.logs as logs

    logger = logging.getLogger("grayscott_tpu")
    for h in list(logger.handlers):
        logger.removeHandler(h)
    lg = logs.init_logging(prefer_syslog=False)
    assert lg.handlers


def test_distributed_single_process_noop(monkeypatch):
    """No GRAYSCOTT_COORDINATOR => no jax.distributed init; fetch is a
    plain host copy; process 0 is primary."""
    import numpy as np

    from grayscott_tpu.utils import distributed as dist

    monkeypatch.delenv("GRAYSCOTT_COORDINATOR", raising=False)
    assert dist.maybe_initialize() is False
    assert dist.process_count() == 1
    assert dist.is_primary() is True
    import jax.numpy as jnp

    x = jnp.arange(6.0).reshape(2, 3)
    out = dist.fetch(x)
    assert isinstance(out, np.ndarray)
    np.testing.assert_array_equal(out, np.arange(6.0).reshape(2, 3))


def test_env_flag_parsing(monkeypatch):
    from grayscott_tpu.utils.runtime import env_flag

    for off in ("", "0", "false", "False", "no", "off", " 0 "):
        monkeypatch.setenv("GRAYSCOTT_TESTFLAG", off)
        assert env_flag("GRAYSCOTT_TESTFLAG") is False, repr(off)
    for on in ("1", "true", "yes", "anything"):
        monkeypatch.setenv("GRAYSCOTT_TESTFLAG", on)
        assert env_flag("GRAYSCOTT_TESTFLAG") is True, repr(on)
    monkeypatch.delenv("GRAYSCOTT_TESTFLAG")
    assert env_flag("GRAYSCOTT_TESTFLAG") is False
