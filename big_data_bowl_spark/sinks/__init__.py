from .viz import collect_for_viz, control_surface_matrix, save_heatmap  # noqa: F401
