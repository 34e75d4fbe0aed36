"""The on-device check CLI must stay importable and fail cleanly off-TPU.

The real checks only run on TPU hardware (see cli/verify_tpu.py); this
smoke test pins the module's import surface and its not-on-TPU exit path
so an API regression breaks the CPU suite instead of a TPU session.
"""

import pytest

from geometric_adv_tpu.cli import verify_tpu


def test_exits_nonzero_off_tpu(capsys):
    with pytest.raises(SystemExit) as exc:
        verify_tpu.main()
    assert exc.value.code == 1
    out = capsys.readouterr().out
    assert "[FAIL] backend is TPU" in out
    # module state must be clean for a rerun (the module-level failure list)
    verify_tpu._FAILURES.clear()
