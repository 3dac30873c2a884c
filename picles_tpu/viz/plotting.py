"""Visualization (reference src/visualization/: plotting_1D.jl, movie_2D.jl,
global.jl) on matplotlib.

cartopy/GeoMakie are not available in this environment, so the globe views
implement the orthographic projection directly (the same views as
PlotState_SingleGlobe/DoubleGlobe, global.jl:4-60): far-side points are
masked, two hemispheres give the double-globe layout, and the tripolar seam
can be overlaid.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import animation  # noqa: E402


def significant_wave_height(e):
    """Hs = 4 sqrt(E)."""
    return 4.0 * np.sqrt(np.maximum(np.asarray(e), 0.0))


# ---------------------------------------------------------------------------
# 1D panels (reference plotting_1D.jl:7-34)
# ---------------------------------------------------------------------------

def plot_results_1d(data, x, time, *, u_func=None, path=None):
    """Hs / group-speed / forcing panel plot for a 1D run.

    data: [nt, nx, 3] stacked state history; x: [nx] meters; time: [nt] s.
    """
    data = np.asarray(data)
    x_km = np.asarray(x) / 1e3
    t_h = np.asarray(time) / 3600.0
    nrows = 3 if u_func is not None else 2
    fig, axes = plt.subplots(nrows, 1, figsize=(8, 2.6 * nrows), sharex=True)

    hs = significant_wave_height(data[..., 0])
    im0 = axes[0].pcolormesh(x_km, t_h, hs, shading="auto", cmap="viridis")
    fig.colorbar(im0, ax=axes[0], label="Hs [m]")
    axes[0].set_ylabel("time [h]")

    with np.errstate(divide="ignore", invalid="ignore"):
        cg = np.where(np.abs(data[..., 1]) > 0,
                      data[..., 0] / (2 * data[..., 1]), 0.0)
    im1 = axes[1].pcolormesh(x_km, t_h, cg, shading="auto", cmap="RdBu_r")
    fig.colorbar(im1, ax=axes[1], label="c_g [m/s]")
    axes[1].set_ylabel("time [h]")

    if u_func is not None:
        U = np.asarray([[float(u_func(xx, tt)) for xx in np.asarray(x)]
                        for tt in np.asarray(time)])
        im2 = axes[2].pcolormesh(x_km, t_h, U, shading="auto", cmap="PuOr_r")
        fig.colorbar(im2, ax=axes[2], label="U10 [m/s]")
        axes[2].set_ylabel("time [h]")
    axes[-1].set_xlabel("x [km]")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


# ---------------------------------------------------------------------------
# 2D box plots + movie (reference movie_2D.jl)
# ---------------------------------------------------------------------------

def plot_state_2d(grid, state, var: int = 0, *, ax=None, coast=True,
                  title=None, cmap="viridis"):
    """Heatmap of one state variable with land mask overlay."""
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 5))
    x = np.asarray(grid.x)
    y = np.asarray(grid.y)
    s = np.asarray(state[..., var])
    land = np.asarray(grid.mask) == 0
    s = np.ma.masked_where(land, s)
    im = ax.pcolormesh(x, y, s, shading="auto", cmap=cmap)
    plt.colorbar(im, ax=ax)
    if title:
        ax.set_title(title)
    return ax


def movie_2d(grid, states, path: str, *, winds=None, times=None, fps: int = 8,
             var: int = 0, as_hs: bool = True):
    """Animated Hs field + optional wind quiver (movie_2D.jl analog).

    states: [nt, nx, ny, 3]; writes a GIF via pillow.
    """
    states = np.asarray(states)
    x = np.asarray(grid.x) / 1e3 if grid.stats.kind == "cartesian" \
        else np.asarray(grid.x)
    y = np.asarray(grid.y) / 1e3 if grid.stats.kind == "cartesian" \
        else np.asarray(grid.y)
    data = (significant_wave_height(states[..., 0]) if as_hs
            else states[..., var])
    land = np.asarray(grid.mask) == 0
    vmax = float(np.nanmax(data)) or 1.0

    fig, ax = plt.subplots(figsize=(6.5, 5.5))
    field = np.ma.masked_where(land, data[0])
    im = ax.pcolormesh(x, y, field, shading="auto", cmap="viridis",
                       vmin=0, vmax=vmax)
    fig.colorbar(im, ax=ax, label="Hs [m]" if as_hs else f"state[{var}]")
    title = ax.set_title("t = 0")

    def update(i):
        im.set_array(np.ma.masked_where(land, data[i]).ravel())
        label = (f"t = {times[i]/3600.0:.1f} h" if times is not None
                 else f"frame {i}")
        title.set_text(label)
        return im, title

    ani = animation.FuncAnimation(fig, update, frames=data.shape[0])
    ani.save(path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return path


# ---------------------------------------------------------------------------
# globes (reference global.jl)
# ---------------------------------------------------------------------------

def _orthographic(lon, lat, lon0, lat0):
    """Orthographic projection; returns (X, Y, visible mask)."""
    lam = np.radians(np.asarray(lon) - lon0)
    phi = np.radians(np.asarray(lat))
    phi0 = math.radians(lat0)
    cosc = math.sin(phi0) * np.sin(phi) + math.cos(phi0) * np.cos(phi) * np.cos(lam)
    X = np.cos(phi) * np.sin(lam)
    Y = math.cos(phi0) * np.sin(phi) - math.sin(phi0) * np.cos(phi) * np.cos(lam)
    return X, Y, cosc > 0


def plot_state_globe(grid, state, *, var: int = 0, lon0: float = 0.0,
                     lat0: float = 30.0, ax=None, cmap="viridis",
                     show_seam: bool = False):
    """Single orthographic globe (PlotState_SingleGlobe analog)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(5, 5))
    X, Y, vis = _orthographic(np.asarray(grid.x), np.asarray(grid.y),
                              lon0, lat0)
    s = np.asarray(state[..., var]).copy()
    s[~vis] = np.nan
    s[np.asarray(grid.mask) == 0] = np.nan
    im = ax.scatter(X[vis], Y[vis], c=s[vis], s=4, cmap=cmap)
    plt.colorbar(im, ax=ax)
    th = np.linspace(0, 2 * math.pi, 200)
    ax.plot(np.cos(th), np.sin(th), color="k", lw=0.6)
    if show_seam:
        top = (slice(None), -1)
        Xs, Ys, vs = _orthographic(np.asarray(grid.x)[top],
                                   np.asarray(grid.y)[top], lon0, lat0)
        ax.plot(Xs[vs], Ys[vs], color="r", lw=1.0)
    ax.set_aspect("equal")
    ax.axis("off")
    return ax


def plot_state_double_globe(grid, state, *, var: int = 0, lat0: float = 30.0,
                            lons=(-30.0, 150.0), path=None,
                            show_seam: bool = False):
    """Two opposing hemispheres (PlotState_DoubleGlobe[Seam] analog)."""
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    for ax, lon0 in zip(axes, lons):
        plot_state_globe(grid, state, var=var, lon0=lon0, lat0=lat0, ax=ax,
                         show_seam=show_seam)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig
