"""Debug-mode guards (SURVEY section 5: jit-leak / NaN analogues of the
reference's JET + allocation checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrtmgp_tpu.utils.debug import strict_mode


def test_strict_mode_clean_solve():
    """A gray solve runs clean under leak+NaN checking."""
    from rrtmgp_tpu.models.gray import setup_gray_as_pr_grid, solve_gray_lw
    from rrtmgp_tpu.models.gray import GrayOpticalThicknessSchneider2004
    from rrtmgp_tpu.parameters import RRTMGPParameters

    P = RRTMGPParameters()
    atm = setup_gray_as_pr_grid(
        8, jnp.linspace(-60.0, 60.0, 16), 1e5, 9e3,
        GrayOpticalThicknessSchneider2004(), P,
    )
    with strict_mode():
        up, dn, net = jax.jit(lambda a: solve_gray_lw(a, jnp.ones((16,)), P))(atm)
        jax.block_until_ready(up)
    assert np.isfinite(np.asarray(up)).all()


def test_strict_mode_catches_nan():
    with strict_mode(leaks=False):
        with pytest.raises((FloatingPointError, Exception)):
            bad = jax.jit(lambda x: jnp.log(x - 1.0))(jnp.zeros((4,)))
            jax.block_until_ready(bad)
