"""Property-based tests (hypothesis): PBC geometry invariants, record codec
round-trips, streaming-moments equivalence on arbitrary series."""

import io

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from ljmd_tpu.io.fortran_records import read_records, write_record
from ljmd_tpu.ops.geometry import minimum_image, wrap_positions

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@pytest.mark.slow
@settings(max_examples=200, deadline=None)
@given(
    u=hnp.arrays(
        np.float64, hnp.array_shapes(max_dims=2, max_side=16),
        elements=st.floats(min_value=-2.0, max_value=3.0, allow_nan=False),
    ),
    L=st.floats(min_value=1e-2, max_value=1e4),
)
def test_wrap_always_lands_in_box(u, L):
    # physical domain: positions within a few box lengths (integrator steps
    # move particles fractions of L; |x| >> L would lose precision to
    # cancellation by construction)
    x = u * L
    w = np.asarray(wrap_positions(jnp.asarray(x), L))
    assert (w >= 0).all() and (w < L).all()
    # wrapping is idempotent
    w2 = np.asarray(wrap_positions(jnp.asarray(w), L))
    np.testing.assert_allclose(w2, w, atol=1e-9 * L)
    # shift-by-L invariance (modulo L)
    w3 = np.asarray(wrap_positions(jnp.asarray(x + L), L))
    d = w3 - w
    d -= L * np.round(d / L)
    np.testing.assert_allclose(d, 0.0, atol=1e-6 * L)


@settings(max_examples=200, deadline=None)
@given(
    d=hnp.arrays(np.float64, hnp.array_shapes(max_dims=1, max_side=32), elements=finite_floats),
    L=st.floats(min_value=1e-2, max_value=1e4),
)
def test_minimum_image_bounds_and_antisymmetry(d, L):
    m = np.asarray(minimum_image(jnp.asarray(d), L))
    assert (np.abs(m) <= L / 2 * (1 + 1e-9) + 1e-12).all()
    # antisymmetry: MIC(-d) == -MIC(d) except at exact half-box ties
    m_neg = np.asarray(minimum_image(jnp.asarray(-d), L))
    ties = np.isclose(np.abs(m), L / 2, rtol=1e-9)
    np.testing.assert_allclose(m_neg[~ties], -m[~ties], atol=1e-9 * L)
    # m differs from d by an exact multiple of L
    k = (d - m) / L
    np.testing.assert_allclose(k, np.round(k), atol=1e-6)


@settings(max_examples=100, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=8),
    marker=st.sampled_from([4, 8]),
)
def test_record_codec_roundtrip_property(tmp_path_factory, payloads, marker):
    import os
    import tempfile

    fd, path = tempfile.mkstemp()
    try:
        with os.fdopen(fd, "wb") as f:
            for p in payloads:
                write_record(f, p, marker)
        # empty first payload defeats marker auto-detection; skip those
        if len(payloads[0]) > 0:
            got = read_records(path)
            assert got == payloads
    finally:
        os.unlink(path)


@settings(max_examples=50, deadline=None)
@given(
    series=hnp.arrays(
        np.float64, st.integers(min_value=2, max_value=64),
        elements=st.floats(min_value=0.5, max_value=100.0),
    )
)
@pytest.mark.slow
def test_means_accumulator_property(series):
    """Streaming moments equal direct numpy statistics for any positive-K
    series (K > 0 is the physical domain)."""
    from ljmd_tpu.state import StepObs
    from ljmd_tpu.stats.moments import means_finalize, means_init, means_update

    acc = means_init(dtype=jnp.float64)
    for k in series:
        obs = StepObs(
            epot=jnp.asarray(-2.0 * k), ekin=jnp.asarray(float(k)),
            d_epot=jnp.asarray(0.5 * k), dd_epot=jnp.asarray(3.0 * k),
        )
        acc = means_update(acc, obs, n=10, volume=100.0)
    rep = means_finalize(acc)
    np.testing.assert_allclose(float(rep.mean("ekin")), series.mean(), rtol=1e-10)
    np.testing.assert_allclose(
        float(rep.mean("ekin_inv")), (1.0 / series).mean(), rtol=1e-10
    )
    # std via sum-of-squares cancels catastrophically for near-constant
    # series (the reference's own formula, stats_math.f90:56-61): compare
    # with an absolute tolerance scaled by the mean magnitude.
    np.testing.assert_allclose(
        float(rep.std("ekin")),
        np.sqrt(np.maximum((series**2).mean() - series.mean() ** 2, 0)),
        rtol=1e-6, atol=1e-6 * (abs(series).mean() + 1.0),
    )
