"""Field plotting utilities (reference common/graphx.py).

Panel-mosaic and lat/lon scatter plots of cubed-sphere fields with
matplotlib; cartopy projections are used when available (optional in the
reference too).
"""

from typing import Optional

import numpy as np

try:
    import cartopy.crs as ccrs

    HAVE_CARTOPY = True
except ImportError:
    HAVE_CARTOPY = False


def plot_panels(geom, field, path: str, title: str = "", cmap: str = "viridis") -> None:
    """Six-panel mosaic of a cubed-sphere field (element-blocked layout)."""
    import matplotlib.pyplot as plt

    blocks = geom.to_single_block(np.asarray(field))
    fig, axes = plt.subplots(2, 3, figsize=(13, 7))
    vmin, vmax = blocks.min(), blocks.max()
    for p in range(6):
        ax = axes[p // 3][p % 3]
        im = ax.imshow(blocks[p], origin="lower", cmap=cmap, vmin=vmin, vmax=vmax)
        ax.set_title(f"panel {p}")
    fig.colorbar(im, ax=axes, shrink=0.8)
    if title:
        fig.suptitle(title)
    fig.savefig(path, dpi=130)
    plt.close(fig)


def plot_sphere(geom, field, path: str, title: str = "", cmap: str = "viridis",
                projection: Optional[str] = "Robinson") -> None:
    """Global lat/lon view. With cartopy installed, a proper map projection;
    otherwise a plate-carree scatter."""
    import matplotlib.pyplot as plt

    lon = np.degrees(np.asarray(geom.lon)).ravel()
    lat = np.degrees(np.asarray(geom.lat)).ravel()
    vals = np.asarray(field).ravel()

    if HAVE_CARTOPY and projection:
        proj = getattr(ccrs, projection)()
        fig = plt.figure(figsize=(11, 6))
        ax = plt.axes(projection=proj)
        sc = ax.scatter(lon, lat, c=vals, s=2, cmap=cmap, transform=ccrs.PlateCarree())
        ax.coastlines()
    else:
        fig = plt.figure(figsize=(11, 6))
        ax = plt.gca()
        sc = ax.scatter(lon, lat, c=vals, s=2, cmap=cmap)
        ax.set_xlabel("longitude")
        ax.set_ylabel("latitude")
    fig.colorbar(sc, ax=ax, shrink=0.8)
    if title:
        ax.set_title(title)
    fig.savefig(path, dpi=130)
    plt.close(fig)


def image_field(geom, field, path: str, **kwargs) -> None:
    """Reference-compatible name for the basic field plot."""
    plot_panels(geom, field, path, **kwargs)
