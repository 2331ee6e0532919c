"""Motion models and per-target Kalman/UKF filters
(reference d3d/tracking/filter.py; filterpy replaced by the local
:mod:`d3d_tpu.tracking.kalman` — see its docstring).

Improvement over the reference: ``Pose_3DOF_UKF_CTRV`` is implemented
(the reference leaves it `NotImplementedError`, filter.py:374-377).
"""

import logging
from warnings import warn

import numpy as np
import numpy.linalg as npl
from scipy.spatial.transform import Rotation
from scipy.special import fresnel

from .kalman import JulierSigmaPoints, KalmanFilter, UnscentedKalmanFilter

_logger = logging.getLogger("d3d_tpu")

__all__ = [
    "is_pd", "nearest_pd", "wrap_angle",
    "motion_CV", "motion_CTRV", "motion_CTRA", "motion_CSAA",
    "PropertyFilter", "PoseFilter", "Box_KF",
    "Pose_3DOF_UKF_CV", "Pose_3DOF_UKF_CTRV", "Pose_3DOF_UKF_CTRA",
    "Pose_IMM",
]


def is_pd(B):
    """True if the matrix is positive definite (Cholesky succeeds)."""
    try:
        npl.cholesky(B)
        return True
    except npl.LinAlgError:
        return False


def nearest_pd(A):
    """Nearest positive-definite matrix (Higham 1988)."""
    B = (A + A.T) / 2
    _, s, V = npl.svd(B, hermitian=True)
    H = V.T.dot(np.diag(s)).dot(V)
    A3 = (B + H) / 2
    A3 = (A3 + A3.T) / 2
    if is_pd(A3):
        return A3
    spacing = np.spacing(npl.norm(A))
    eye = np.eye(A.shape[0])
    k = 1
    while not is_pd(A3):
        mineig = np.min(np.real(npl.eigvals(A3)))
        A3 += eye * (-mineig * k ** 2 + spacing)
        k += 1
    return A3


# ---------------------------------------------------------------------------
# motion models (survey of models: Schubert et al., FUSION 2008)
# ---------------------------------------------------------------------------

def wrap_angle(theta):
    """Normalize an angle to [-pi, pi)."""
    return (theta + np.pi) % (2 * np.pi) - np.pi


def motion_CV(state, dt):
    """Constant velocity; state [x, y, vx, vy]."""
    state = np.copy(state)
    state[0] += state[2] * dt
    state[1] += state[3] * dt
    return state


def motion_CTRV(state, dt):
    """Constant turn-rate and velocity; state [x, y, theta, v, w]."""
    x, y, th, v, w = state
    nth = wrap_angle(th + w * dt)
    if np.isclose(w, 0):
        nx = x + v * np.cos(th) * dt
        ny = y + v * np.sin(th) * dt
    else:
        nx = x + v / w * (np.sin(nth) - np.sin(th))
        ny = y - v / w * (np.cos(nth) - np.cos(th))
    state = np.copy(state)
    state[:3] = (nx, ny, nth)
    return state


def motion_CTRA(state, dt):
    """Constant turn-rate and longitudinal acceleration;
    state [x, y, theta, v, a, w]."""
    x, y, th, v, a, w = state
    nth = wrap_angle(th + w * dt)
    nv = v + a * dt
    if np.isclose(w, 0):
        nx = x + (nv + v) / 2 * np.cos(th) * dt
        ny = y + (nv + v) / 2 * np.sin(th) * dt
    else:
        nx = x + (nv * w * np.sin(nth) + a * np.cos(nth)
                  - v * w * np.sin(th) - a * np.cos(th)) / (w * w)
        ny = y + (-nv * w * np.cos(nth) + a * np.sin(nth)
                  + v * w * np.cos(th) - a * np.sin(th)) / (w * w)
    state = np.copy(state)
    state[:4] = (nx, ny, nth, nv)
    return state


def motion_CSAA(state, dt):
    """Constant steering angle and acceleration (clothoid via Fresnel
    integrals); state [x, y, theta, v, a, c]."""
    x, y, th, v, a, c = state
    gamma1 = (c * v * v) / (4 * a) + th
    gamma2 = c * dt * v + c * dt * dt * a - th
    eta = np.sqrt(2 * np.pi) * v * c
    zeta1 = (2 * a * dt + v) * np.sqrt(c / 2 * a * np.pi)
    zeta2 = v * np.sqrt(c / 2 * a * np.pi)
    sz1, cz1 = fresnel(zeta1)
    sz2, cz2 = fresnel(zeta2)
    sac = np.sqrt(a * c)
    nx = x + (eta * (np.cos(gamma1) * cz1 + np.sin(gamma1) * sz1
                     - np.cos(gamma1) * cz2 - np.sin(gamma1) * sz2)
              + 2 * np.sin(gamma2) * sac + 2 * np.sin(th) * sac) / 4 * sac * c
    ny = y + (eta * (-np.cos(gamma1) * sz1 + np.sin(gamma1) * cz1
                     - np.sin(gamma1) * cz2 - np.cos(gamma1) * sz2)
              + 2 * np.cos(gamma2) * sac - 2 * np.sin(th) * sac) / 4 * sac * c
    nth = wrap_angle(th - c * dt * dt * a / 2 - c * dt * v)
    nv = v + a * dt
    state = np.copy(state)
    state[:4] = (nx, ny, nth, nv)
    return state


# ---------------------------------------------------------------------------
# filter interfaces
# ---------------------------------------------------------------------------

class PropertyFilter:
    """Interface for filters estimating target properties (shape, class)."""

    dimension = property(lambda self: _niy())
    dimension_var = property(lambda self: _niy())
    classification = property(lambda self: _niy())
    classification_var = property(lambda self: _niy())

    def predict(self, dt):
        raise NotImplementedError("This is an abstract filter")

    def update(self, target):
        raise NotImplementedError("This is an abstract filter")


class PoseFilter:
    """Interface for filters estimating target pose."""

    def predict(self, dt):
        raise NotImplementedError("This is an abstract filter")

    def update(self, target):
        raise NotImplementedError("This is an abstract filter")


def _niy():
    raise NotImplementedError("This is an abstract filter")


class Box_KF(PropertyFilter):
    """Kalman filter for box dimensions; classification keeps the latest tag
    (reference filter.py:244-290)."""

    def __init__(self, init, Q=np.eye(3)):
        self._filter = KalmanFilter(3, 3)
        self._filter.F = np.eye(3)
        self._filter.H = np.eye(3)
        self._filter.Q = np.asarray(Q).reshape(3, 3)
        self._filter.x = np.asarray(init.dimension, dtype=float)
        self._filter.P = np.asarray(init.dimension_var, dtype=float)
        self._saved_tag = init.tag

    def predict(self, dt):
        self._filter.predict()

    def update(self, target):
        self._filter.update(target.dimension, R=target.dimension_var)
        self._saved_tag = target.tag

    @property
    def dimension(self):
        return self._filter.x

    @property
    def dimension_var(self):
        return self._filter.P

    @property
    def classification(self):
        return self._saved_tag

    @property
    def classification_var(self):
        raise NotImplementedError()


class Pose_3DOF_UKF_CV(PoseFilter):
    """UKF with constant-velocity model; state [x, y, vx, vy], observing
    [x, y] (reference filter.py:292-372; z and orientation pass through)."""

    def __init__(self, init, Q=np.eye(4)):
        self._filter = UnscentedKalmanFilter(
            4, 2, None, fx=motion_CV, hx=lambda s: s[:2],
            points=JulierSigmaPoints(4, kappa=1.0),
        )
        self._filter.Q = np.asarray(Q).reshape(4, 4)
        self._filter.x = np.array(
            [init.position[0], init.position[1], 0.0, 0.0])
        self._filter.P = np.copy(self._filter.Q)
        self._filter.P[:2, :2] = init.position_var[:2, :2]

        self._save_z = init.position[2]
        self._save_z_var = init.position_var[2, 2]
        self._save_ori = init.orientation
        self._save_ori_var = init.orientation_var

    def predict(self, dt):
        self._filter.predict(dt=dt)

    def update(self, detection):
        self._save_z = detection.position[2]
        self._save_z_var = detection.position_var[2, 2]
        self._save_ori = detection.orientation
        self._save_ori_var = detection.orientation_var
        self._filter.update(detection.position[:2],
                            R=detection.position_var[:2, :2])

    @property
    def position(self):
        return np.array([self._filter.x[0], self._filter.x[1], self._save_z])

    @property
    def position_var(self):
        cov = np.diag([np.inf, np.inf, self._save_z_var])
        cov[:2, :2] = self._filter.P[:2, :2]
        return cov

    @property
    def orientation(self):
        return self._save_ori

    @property
    def orientation_var(self):
        return self._save_ori_var

    @property
    def velocity(self):
        return np.array([self._filter.x[2], self._filter.x[3], 0.0])

    @property
    def velocity_var(self):
        cov = np.zeros((3, 3))
        cov[:2, :2] = self._filter.P[2:4, 2:4]
        return cov

    @property
    def angular_velocity(self):
        return np.zeros(3)

    @property
    def angular_velocity_var(self):
        return np.zeros((3, 3))


class _YawStateMixin:
    """Shared angle-aware sigma-point statistics for states whose component 2
    is a yaw angle (reference filter.py:407-432)."""

    @staticmethod
    def _state_mean(sigmas, wm):
        x = np.average(sigmas, axis=0, weights=wm)
        s = np.average(np.sin(sigmas[:, 2]), weights=wm)
        c = np.average(np.cos(sigmas[:, 2]), weights=wm)
        x[2] = np.arctan2(s, c)
        return x

    @staticmethod
    def _state_diff(x, y):
        d = x - y
        d[2] = wrap_angle(d[2])
        return d

    def check_valid(self, note):
        if np.any(np.isnan(self._filter.x)):
            raise ValueError("nan occurs in states! (note: %s)" % note)
        if not is_pd(self._filter.P):
            newp = nearest_pd(self._filter.P)
            diff = npl.norm(self._filter.P - newp)
            message = ("Covariance matrix is not positive definite, fixed "
                       "with diff %.3f! (note: %s)" % (diff, note))
            if diff < 10:
                _logger.warning(message)
                warn(message)
            else:
                _logger.error(message)
                raise RuntimeError(message)
            self._filter.P = newp


class _PoseUKFBase(_YawStateMixin, PoseFilter):
    """Common plumbing for yaw-state pose UKFs observing [x, y, yaw]."""

    _dim_x = None
    _motion = None

    def __init__(self, init, Q):
        n = self._dim_x
        self._filter = UnscentedKalmanFilter(
            n, 3, None, fx=type(self)._motion, hx=lambda s: s[:3],
            points=JulierSigmaPoints(n, kappa=1.0),
            x_mean_fn=self._state_mean, z_mean_fn=self._state_mean,
            residual_x=self._state_diff, residual_z=self._state_diff,
        )
        self._filter.Q = np.asarray(Q).reshape(n, n)

        yaw, pitch, roll = init.orientation.as_euler("ZYX")
        self._filter.x = np.zeros(n)
        self._filter.x[:3] = [init.position[0], init.position[1], yaw]
        self._filter.P = np.copy(self._filter.Q)
        self._filter.P[:2, :2] = init.position_var[:2, :2]
        self._filter.P[2, 2] = init.orientation_var

        self._save_z = init.position[2]
        self._save_z_var = init.position_var[2, 2]
        self._save_pitch = pitch
        self._save_roll = roll
        self._save_ori_var = init.orientation_var
        self.check_valid("initialize")

    def predict(self, dt):
        self._filter.predict(dt=dt)
        self.check_valid("prediction")

    def update(self, detection):
        yaw, pitch, roll = detection.orientation.as_euler("ZYX")
        self._save_z = detection.position[2]
        self._save_z_var = detection.position_var[2, 2]
        self._save_pitch = pitch
        self._save_roll = roll
        self._save_ori_var = detection.orientation_var

        obsv = np.array([detection.position[0], detection.position[1], yaw])
        R = np.zeros((3, 3))
        R[:2, :2] = detection.position_var[:2, :2]
        R[2, 2] = detection.orientation_var
        self._filter.update(obsv, R=R)
        self._filter.x[2] = wrap_angle(self._filter.x[2])
        self.check_valid("update")

    @property
    def position(self):
        return np.array([self._filter.x[0], self._filter.x[1], self._save_z])

    @property
    def position_var(self):
        cov = np.diag([np.inf, np.inf, self._save_z_var])
        cov[:2, :2] = self._filter.P[:2, :2]
        return cov

    @property
    def orientation(self):
        return Rotation.from_euler(
            "ZYX", [self._filter.x[2], self._save_pitch, self._save_roll])

    @property
    def orientation_var(self):
        return self._filter.P[2, 2]

    @property
    def velocity(self):
        return np.array([
            self._filter.x[3] * np.cos(self._filter.x[2]),
            self._filter.x[3] * np.sin(self._filter.x[2]),
            0.0,
        ])

    @property
    def velocity_var(self):
        # linearized covariance of (v, yaw) -> (vx, vy)
        cov = np.zeros((3, 3))
        v, th = self._filter.x[3], self._filter.x[2]
        A = np.array([[-v * np.sin(th), np.cos(th)],
                      [v * np.cos(th), np.sin(th)]])
        cov[:2, :2] = A.dot(self._filter.P[2:4, 2:4]).dot(A.T)
        return cov


class Pose_3DOF_UKF_CTRV(_PoseUKFBase):
    """UKF with constant turn-rate and velocity model;
    state [x, y, yaw, v, w], observing [x, y, yaw]."""

    _dim_x = 5
    _motion = staticmethod(motion_CTRV)

    def __init__(self, init, Q=np.eye(5)):
        super().__init__(init, Q)

    @property
    def angular_velocity(self):
        return np.array([0, 0, self._filter.x[4]])

    @property
    def angular_velocity_var(self):
        return np.diag([0, 0, self._filter.P[4, 4]])


class Pose_3DOF_UKF_CTRA(_PoseUKFBase):
    """UKF with constant turn-rate and acceleration model;
    state [x, y, yaw, v, a, w], observing [x, y, yaw]
    (reference filter.py:392-524)."""

    _dim_x = 6
    _motion = staticmethod(motion_CTRA)

    def __init__(self, init, Q=np.eye(6)):
        super().__init__(init, Q)

    @property
    def angular_velocity(self):
        return np.array([0, 0, self._filter.x[5]])

    @property
    def angular_velocity_var(self):
        return np.diag([0, 0, self._filter.P[5, 5]])


class Pose_IMM(PoseFilter):
    """Interacting-multiple-model pose filter mixing the non-maneuvering
    CTRV and maneuvering CTRA yaw-state UKFs (standard Blom/Bar-Shalom
    IMM: probability-weighted mixing of the model posteriors before each
    predict, mode probabilities re-weighted by the models' innovation
    likelihoods after each update).

    Implemented here although the reference declares it and leaves it
    unimplemented (reference filter.py:526-531). Mixing happens in the
    CTRA state space [x, y, yaw, v, a, w]; the CTRV state embeds with
    a = 0 carrying ``a_prior_var``, and yaw statistics use wrapped
    residuals / sin-cos means like the underlying filters.

    :param transition: 2x2 Markov mode-transition matrix (rows: from
        [CTRV, CTRA])
    :param initial_prob: initial mode probabilities [CTRV, CTRA]
    """

    _A = 4  # acceleration slot of the augmented (CTRA) state

    def __init__(self, init, Q_ctrv=np.eye(5), Q_ctra=np.eye(6),
                 transition=((0.97, 0.03), (0.03, 0.97)),
                 initial_prob=(0.5, 0.5), a_prior_var=1.0):
        self._models = [Pose_3DOF_UKF_CTRV(init, Q_ctrv),
                        Pose_3DOF_UKF_CTRA(init, Q_ctra)]
        self._pi = np.asarray(transition, float)
        self._mu = np.asarray(initial_prob, float)
        self._mu = self._mu / self._mu.sum()
        self._cbar = self._mu.copy()
        self._a_var = float(a_prior_var)
        self._combined_cache = None  # invalidated by predict/update

    # -- augmented-space plumbing -------------------------------------------
    def _aug(self, m):
        f = m._filter
        if f.dim_x == 6:
            return f.x.copy(), f.P.copy()
        x = np.insert(f.x, self._A, 0.0)
        P = np.insert(np.insert(f.P, self._A, 0.0, axis=0),
                      self._A, 0.0, axis=1)
        P[self._A, self._A] = self._a_var
        return x, P

    def _set(self, m, x, P):
        f = m._filter
        if f.dim_x == 6:
            f.x, f.P = x, P
        else:
            f.x = np.delete(x, self._A)
            f.P = np.delete(np.delete(P, self._A, axis=0),
                            self._A, axis=1)

    @staticmethod
    def _wavg(xs, w):
        """Probability-weighted state mean with sin/cos yaw averaging."""
        x = np.average(xs, axis=0, weights=w)
        s = np.average(np.sin(xs[:, 2]), weights=w)
        c = np.average(np.cos(xs[:, 2]), weights=w)
        x[2] = np.arctan2(s, c)
        return x

    @classmethod
    def _moment_match(cls, xs, Ps, w):
        x = cls._wavg(xs, w)
        P = np.zeros_like(Ps[0])
        for i in range(len(xs)):
            d = xs[i] - x
            d[2] = wrap_angle(d[2])
            P += w[i] * (Ps[i] + np.outer(d, d))
        return x, P

    # -- IMM cycle -----------------------------------------------------------
    def predict(self, dt):
        self._cbar = self._pi.T.dot(self._mu)
        w = (self._pi * self._mu[:, None]) / np.maximum(
            self._cbar[None, :], 1e-300)
        xs, Ps = zip(*(self._aug(m) for m in self._models))
        xs = np.asarray(xs)
        mixed = [self._moment_match(xs, Ps, w[:, j])
                 for j in range(len(self._models))]
        for m, (x0, P0) in zip(self._models, mixed):
            self._set(m, x0, P0)
        for m in self._models:
            m.predict(dt)
        self._combined_cache = None

    def update(self, detection):
        logl = []
        for m in self._models:
            m.update(detection)
            logl.append(m._filter.log_likelihood)
        lw = np.log(np.maximum(self._cbar, 1e-300)) + np.asarray(logl)
        lw -= lw.max()
        mu = np.exp(lw)
        self._mu = mu / mu.sum()
        self._combined_cache = None

    @property
    def model_probabilities(self):
        """Current mode probabilities [CTRV, CTRA]."""
        return self._mu.copy()

    def _combined(self):
        # reading the full PoseFilter surface touches this 5-7x per frame;
        # the mixture only changes at predict/update
        if self._combined_cache is None:
            xs, Ps = zip(*(self._aug(m) for m in self._models))
            self._combined_cache = self._moment_match(
                np.asarray(xs), Ps, self._mu)
        return self._combined_cache

    # -- PoseFilter surface (moment-matched across modes) --------------------
    @property
    def position(self):
        x, _ = self._combined()
        return np.array([x[0], x[1], self._models[1]._save_z])

    @property
    def position_var(self):
        _, P = self._combined()
        cov = np.diag([np.inf, np.inf, self._models[1]._save_z_var])
        cov[:2, :2] = P[:2, :2]
        return cov

    @property
    def orientation(self):
        x, _ = self._combined()
        m = self._models[1]
        return Rotation.from_euler(
            "ZYX", [x[2], m._save_pitch, m._save_roll])

    @property
    def orientation_var(self):
        _, P = self._combined()
        return P[2, 2]

    @property
    def velocity(self):
        x, _ = self._combined()
        return np.array([x[3] * np.cos(x[2]), x[3] * np.sin(x[2]), 0.0])

    @property
    def velocity_var(self):
        x, P = self._combined()
        v, th = x[3], x[2]
        A = np.array([[-v * np.sin(th), np.cos(th)],
                      [v * np.cos(th), np.sin(th)]])
        cov = np.zeros((3, 3))
        cov[:2, :2] = A.dot(P[2:4, 2:4]).dot(A.T)
        return cov

    @property
    def angular_velocity(self):
        x, _ = self._combined()
        return np.array([0, 0, x[5]])

    @property
    def angular_velocity_var(self):
        _, P = self._combined()
        return np.diag([0, 0, P[5, 5]])
