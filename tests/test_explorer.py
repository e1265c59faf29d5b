"""Interactive posterior explorer: session state machine + widget shell.

Covers the reference GUI's live workflow (Visualization/
marginalization_visual.py:27-640): enable/disable params, edit limits
(non-destructively — widening restores samples), log scales, marks,
temperature factor, replot, stats readout, covariance view, config.txt
persistence.  Runs headless on the Agg backend; widget callbacks are
invoked exactly as matplotlib would.
"""
import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from bayesian_inference_trpl_tpu.posterior.explorer import (
    ExplorerSession, PosteriorExplorer)
from bayesian_inference_trpl_tpu.posterior.vizconfig import (
    VizConfig, load_vizconfig)


@pytest.fixture()
def session():
    rng = np.random.default_rng(7)
    n = 2000
    X = np.zeros((n, 13))
    X[:, 0] = 1e8
    X[:, 1] = 10 ** rng.uniform(14, 16, n)          # p0 (log-ish)
    X[:, 2] = rng.uniform(0, 50, n)                 # mu_n
    X[:, 3] = rng.uniform(0, 50, n)
    X[:, 4] = 10 ** rng.uniform(-11, -9, n)         # B
    X[:, 5] = 10 ** rng.uniform(-1, 2, n)           # Sf
    X[:, 6] = 10 ** rng.uniform(-1, 2, n)           # Sb
    X[:, 7] = 1e-29
    X[:, 8] = 1e-29
    X[:, 9] = rng.uniform(1, 1000, n)               # tau_n
    X[:, 10] = rng.uniform(1, 2000, n)              # tau_p
    X[:, 11] = 0.1
    X[:, 12] = 0.0
    # Likelihood peaked at tau_n = 500 so posterior stats are predictable.
    LL = -((X[:, 9] - 500.0) / 50.0) ** 2
    LL[:3] = np.nan                                  # NaN-filter coverage
    return ExplorerSession(LL, X, num_observations=3)


def test_session_rebuild_is_nondestructive(session):
    n_all = len(session.data.LL)
    session.set_range("tau_n", 400.0, 600.0)
    n_cut = len(session.data.LL)
    assert n_cut < n_all
    # Widening the range RESTORES samples (the reference GUI refilters from
    # the loaded arrays; PosteriorData.exclude_limits alone cannot).
    session.set_range("tau_n", float("nan"), float("nan"))
    assert len(session.data.LL) == n_all


def test_session_tfactor_changes_weights(session):
    session.rebuild()
    p_default = session.data.P.copy()
    session.set_t_factor(50.0)
    assert session.data.P.shape == p_default.shape
    assert not np.allclose(session.data.P, p_default)
    # Hotter temperature flattens: max weight drops.
    assert session.data.P.max() < p_default.max()
    session.set_t_factor(None)
    np.testing.assert_allclose(session.data.P, p_default)


def test_session_stats_text_and_max_uncertainty(session):
    session.set_mark("tau_n", 500.0)
    txt = session.stats_text("tau_n")
    assert "tau_n: mean" in txt and "95% CI" in txt and "mark = 500" in txt
    mean = float(txt.split("mean ")[1].split(" ")[0])
    assert abs(mean - 500.0) < 25.0                 # posterior peak
    tf, std = session.max_uncertainty("tau_n")
    assert tf > 0 and std > 0


def test_session_config_roundtrip(session, tmp_path):
    session.set_enabled("mu_n", True)
    session.set_scale("B", True)
    session.set_range("Sf", 1.0, 50.0)
    session.set_mark("B", 3e-10)
    path = tmp_path / "config.txt"
    session.save_config(str(path))
    viz = load_vizconfig(str(path))
    assert viz.enabled["mu_n"] is True
    assert viz.do_log["B"] is True
    assert viz.ranges["Sf"] == (1.0, 50.0)
    assert viz.marks["B"] == pytest.approx(3e-10)
    # Round-trip into a fresh session: filtered count matches.
    s2 = ExplorerSession(session._LL, session._Xmat, viz=viz)
    assert len(s2.data.LL) == len(session.data.LL)


def test_explorer_widget_shell(session, tmp_path):
    ex = PosteriorExplorer(session, config_path=str(tmp_path / "cfg.txt"),
                           bins=24)
    k0 = len(session.enabled_params())
    assert len(ex.plot_axes) == k0 * k0

    # Toggle a param off via the checkbox callback -> replot shrinks grid.
    on_param = session.enabled_params()[0]
    ex._on_toggle(on_param)
    params = ex.replot()
    assert on_param not in params
    assert len(ex.plot_axes) == (k0 - 1) ** 2

    # Select a param, type limits into the boxes, submit.
    ex._on_select("tau_n")
    ex.w_lo.eventson = False
    ex.w_hi.eventson = False
    ex.w_lo.set_val("400")
    ex.w_hi.set_val("600")
    ex.w_lo.eventson = ex.w_hi.eventson = True
    n_before = len(session.data.LL)
    ex._on_entries("600")
    assert len(session.data.LL) < n_before
    assert session.viz.ranges["tau_n"] == (400.0, 600.0)

    # Selecting another param must NOT clobber stored ranges (set_val
    # fires on_submit unless silenced — regression guard).
    ex._on_select("Sf")
    ex._on_select("tau_n")
    assert session.viz.ranges["tau_n"] == (400.0, 600.0)

    # T-factor entry reweights.
    pmax = session.data.P.max()
    ex._on_tfactor("80")
    assert session.data.P.max() != pmax

    # Stats readout follows the selection.
    ex._update_stats()
    assert "tau_n" in ex._stats_artist.get_text()

    # Covariance mode draws a single heatmap axes; toggling back restores.
    ex._on_cov(None)
    assert ex.mode == "cov" and len(ex.plot_axes) == 1
    ex._on_cov(None)
    assert ex.mode == "corner"

    # Save button persists the live config.
    ex._on_save(None)
    viz = load_vizconfig(str(tmp_path / "cfg.txt"))
    assert viz.ranges["tau_n"] == (400.0, 600.0)

    import matplotlib.pyplot as plt
    plt.close(ex.fig)
