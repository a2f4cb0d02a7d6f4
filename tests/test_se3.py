import numpy as np
import pytest

from deeppointmap_tpu.utils import se3 as s


def random_se3(rng, scale_t=10.0):
    w = rng.normal(size=3)
    R = s.so3_exp(w)
    t = rng.normal(size=3) * scale_t
    return s.se3(R, t)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_se3_assemble_split(rng):
    T = random_se3(rng)
    R, t = s.rt(T)
    assert np.allclose(s.se3(R, t), T)


def test_inverse(rng):
    T = random_se3(rng)
    assert np.allclose(T @ s.inv(T), np.eye(4), atol=1e-12)


def test_rotation_angle(rng):
    for theta in [0.0, 0.3, 1.5, 3.0]:
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        R = s.so3_exp(axis * theta)
        assert abs(s.rotation_angle(R) - theta) < 1e-9


def test_so3_roundtrip(rng):
    for theta in [1e-10, 1e-6, 0.1, 1.0, 3.0, np.pi - 1e-7]:
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        w = axis * theta
        w2 = s.so3_log(s.so3_exp(w))
        # log returns an equivalent rotation vector
        assert np.allclose(s.so3_exp(w2), s.so3_exp(w), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    for _ in range(20):
        xi = rng.normal(size=6)
        T = s.se3_exp(xi)
        xi2 = s.se3_log(T)
        assert np.allclose(s.se3_exp(xi2), T, atol=1e-9)


def test_se3_log_exp_identity():
    assert np.allclose(s.se3_log(np.eye(4)), np.zeros(6))
    assert np.allclose(s.se3_exp(np.zeros(6)), np.eye(4))


def test_adjoint_property(rng):
    # Exp(Ad_T xi) = T Exp(xi) T^-1
    T = random_se3(rng)
    xi = rng.normal(size=6) * 0.1
    lhs = s.se3_exp(s.adjoint(T) @ xi)
    rhs = T @ s.se3_exp(xi) @ s.inv(T)
    assert np.allclose(lhs, rhs, atol=1e-9)


def test_global_to_relative(rng):
    Ta, Tb = random_se3(rng), random_se3(rng)
    Ra, ta = s.rt(Ta)
    Rb, tb = s.rt(Tb)
    Rrel, trel = s.global_to_relative(Ra, ta, Rb, tb)
    # composing current pose with relative recovers other pose
    assert np.allclose(Ta @ s.se3(Rrel, trel), Tb, atol=1e-9)


def test_project_to_so3(rng):
    R = s.so3_exp(rng.normal(size=3))
    noisy = R + rng.normal(size=(3, 3)) * 1e-3
    P = s.project_to_so3(noisy)
    assert np.allclose(P @ P.T, np.eye(3), atol=1e-10)
    assert np.linalg.det(P) > 0
    assert np.linalg.norm(P - R) < 1e-2
