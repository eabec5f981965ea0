"""JAX-native SE(3) rigid-body transforms as (quaternion, translation) pairs.

Replaces the reference's Sophus::SE3f / Eigen::Quaternion usage (e.g.
/root/reference/src/flame/flame.cc:245, stereo/epipolar_geometry.h:86-103)
with pure-functional array ops that vmap/jit cleanly. Quaternions are stored
in wxyz order and all functions broadcast over leading batch dimensions.

A transform T = (q, t) maps points p via T(p) = R(q) @ p + t, i.e. it is the
pose of a camera in the world when p is in camera coordinates.
"""

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternion primitives (wxyz convention).
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, broadcasting over leading dims."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q.

    Uses the 2-cross-product form: v' = v + 2*w*(u x v) + 2*(u x (u x v)).
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion(s) -> rotation matrix/matrices (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_matrix(m: jax.Array) -> jax.Array:
    """Rotation matrix/matrices -> unit quaternion(s), wxyz.

    Branchless Shepperd's method: compute all four candidate solutions and
    select the best-conditioned one (largest pivot) with jnp.where, so it is
    safe under vmap/jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component^2 (>= 0).
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.maximum(qw, 1e-12)
    s = 2.0 * jnp.sqrt(qw)

    cand = jnp.stack(
        [
            # pivot w
            jnp.stack([s[..., 0] / 4, (m21 - m12) / s[..., 0],
                       (m02 - m20) / s[..., 0], (m10 - m01) / s[..., 0]], axis=-1),
            # pivot x
            jnp.stack([(m21 - m12) / s[..., 1], s[..., 1] / 4,
                       (m01 + m10) / s[..., 1], (m02 + m20) / s[..., 1]], axis=-1),
            # pivot y
            jnp.stack([(m02 - m20) / s[..., 2], (m01 + m10) / s[..., 2],
                       s[..., 2] / 4, (m12 + m21) / s[..., 2]], axis=-1),
            # pivot z
            jnp.stack([(m10 - m01) / s[..., 3], (m02 + m20) / s[..., 3],
                       (m12 + m21) / s[..., 3], s[..., 3] / 4], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4 components)

    best = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SE(3): transforms as dicts of arrays would be loose; use a (q, t) tuple
# convention wrapped in small helpers. Pytree-friendly.
# ---------------------------------------------------------------------------


def identity(dtype=jnp.float32):
    return quat_identity(dtype), jnp.zeros(3, dtype=dtype)


def make(q: jax.Array, t: jax.Array):
    return quat_normalize(jnp.asarray(q)), jnp.asarray(t)


def mul(a, b):
    """Compose transforms: (a*b)(p) = a(b(p))."""
    qa, ta = a
    qb, tb = b
    return quat_mul(qa, qb), quat_rotate(qa, tb) + ta


def inverse(T):
    q, t = T
    qinv = quat_conj(q)
    return qinv, -quat_rotate(qinv, t)


def act(T, p: jax.Array) -> jax.Array:
    """Apply transform to point(s) p (..., 3)."""
    q, t = T
    return quat_rotate(q, p) + t


def relative(T_a, T_b):
    """Transform taking coordinates of frame b into frame a: T_a^-1 * T_b."""
    return mul(inverse(T_a), T_b)


def to_matrix(T) -> jax.Array:
    """(q, t) -> 4x4 homogeneous matrix."""
    q, t = T
    R = quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype),
        top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(m: jax.Array):
    return quat_from_matrix(m[..., :3, :3]), m[..., :3, 3]


# ---------------------------------------------------------------------------
# exp/log maps (needed by the BA layer for pose updates on the manifold).
# ---------------------------------------------------------------------------


# Small-angle series threshold. CRITICAL for float32: the direct formulas
# contain 1-cos(theta) and theta-sin(theta), which lose ALL mantissa bits
# below theta ~ 3e-4 (relative error of (1-cos)/theta^2 is ~eps/theta^2).
# The crossover where the 3-term series beats the direct evaluation is
# theta ~ 0.04; we switch at theta^2 < 9e-4 (theta < 0.03).
_SMALL_THETA2 = 9e-4


def _so3_exp(w: jax.Array):
    """Axis-angle (..., 3) -> (unit quaternion, theta, theta^2, small)."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < _SMALL_THETA2

    half = 0.5 * theta
    sinc_half = jnp.where(small,
                          0.5 - theta2 / 48.0 + theta2 * theta2 / 3840.0,
                          jnp.sin(half) / theta)
    qw = jnp.where(small[..., 0],
                   1.0 - theta2[..., 0] / 8.0
                   + theta2[..., 0] * theta2[..., 0] / 384.0,
                   jnp.cos(half[..., 0]))
    q = jnp.concatenate([qw[..., None], sinc_half * w], axis=-1)
    return quat_normalize(q), theta, theta2, small


def exp(xi: jax.Array):
    """se(3) tangent (..., 6) [v, w] -> SE(3) transform (q, t).

    Uses the closed-form V matrix: t = V @ v with
    V = I + (1-cos th)/th^2 [w]_x + (th - sin th)/th^3 [w]_x^2.
    """
    v, w = xi[..., :3], xi[..., 3:]
    q, theta, theta2, small = _so3_exp(w)

    A = jnp.where(small,
                  0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-24))
    B = jnp.where(small,
                  1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta,
                                                         1e-24))

    wxv = jnp.cross(w, v)
    wxwxv = jnp.cross(w, wxv)
    t = v + A * wxv + B * wxwxv
    return q, t


def log(T) -> jax.Array:
    """SE(3) -> tangent (..., 6) [v, w]; inverse of exp."""
    q, t = T
    qw = jnp.clip(jnp.abs(q[..., 0]), 0.0, 1.0)
    # Force positive hemisphere for a unique log.
    sign = jnp.where(q[..., 0] < 0, -1.0, 1.0)[..., None]
    u = q[..., 1:] * sign
    un = jnp.linalg.norm(u, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(un[..., 0], qw)[..., None]
    small = un < 1e-9
    w = jnp.where(small, 2.0 * u, theta * u / jnp.maximum(un, 1e-24))

    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    th = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small2 = theta2 < _SMALL_THETA2
    # V^-1 = I - 1/2 [w]_x + coef [w]_x^2 with
    # coef = (1 - theta*sin(theta) / (2*(1 - cos(theta)))) / theta^2.
    # The direct form is catastrophically cancellation-prone in f32 for
    # small theta (see _SMALL_THETA2); use the series there.
    coef = jnp.where(
        small2,
        1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0,
        (1.0 - th * jnp.sin(th) /
         jnp.maximum(2.0 * (1.0 - jnp.cos(th)), 1e-24)) /
        jnp.maximum(theta2, 1e-24))
    wxt = jnp.cross(w, t)
    wxwxt = jnp.cross(w, wxt)
    v = t - 0.5 * wxt + coef * wxwxt
    return jnp.concatenate([v, w], axis=-1)


def rotation_angle(q: jax.Array) -> jax.Array:
    """Rotation angle in [0, pi] of unit quaternion(s)."""
    return 2.0 * jnp.arctan2(jnp.linalg.norm(q[..., 1:], axis=-1),
                             jnp.abs(q[..., 0]))


def stack(transforms):
    """Stack a list of (q, t) transforms into batched arrays."""
    qs = jnp.stack([T[0] for T in transforms])
    ts = jnp.stack([T[1] for T in transforms])
    return qs, ts


def index(T, i):
    """Select transform i from a batched (q, t)."""
    q, t = T
    return q[i], t[i]
