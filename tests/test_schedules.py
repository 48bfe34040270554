"""Schedule unit tests (reference: common/tests/test_schedules.py:6-25)."""

import numpy as np

from baselines_tpu.core.schedules import (
    ConstantSchedule,
    LinearSchedule,
    PiecewiseSchedule,
)


def test_constant():
    s = ConstantSchedule(5.0)
    for t in [0, 1, 100, 10**6]:
        assert float(s.value(t)) == 5.0


def test_linear():
    s = LinearSchedule(100, final_p=0.0, initial_p=1.0)
    assert np.isclose(float(s.value(0)), 1.0)
    assert np.isclose(float(s.value(50)), 0.5)
    assert np.isclose(float(s.value(100)), 0.0)
    assert np.isclose(float(s.value(1000)), 0.0)


def test_piecewise():
    # mirrors test_schedules.py piecewise case
    s = PiecewiseSchedule(
        [(-5, 100.0), (5, 200.0), (10, 50.0), (100, 50.0), (200, -50.0)],
        outside_value=500.0,
    )
    assert np.isclose(float(s.value(-10)), 500.0)
    assert np.isclose(float(s.value(0)), 150.0)
    assert np.isclose(float(s.value(5)), 200.0)
    assert np.isclose(float(s.value(9)), 80.0)
    assert np.isclose(float(s.value(50)), 50.0)
    assert np.isclose(float(s.value(80)), 50.0)
    assert np.isclose(float(s.value(150)), 0.0)
    assert np.isclose(float(s.value(175)), -25.0)
    assert np.isclose(float(s.value(201)), 500.0)
    assert np.isclose(float(s.value(500)), 500.0)
