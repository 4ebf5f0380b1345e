from diff3dhpe_tpu.viz.render import (
    render_2d_animation,
    render_3d_animation,
    render_chain_animation,
    render_2d_figs,
    render_3d_figs,
)

__all__ = [
    "render_2d_animation",
    "render_3d_animation",
    "render_chain_animation",
    "render_2d_figs",
    "render_3d_figs",
]
