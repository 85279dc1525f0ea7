from .heatmap_kernel import synthesize_heatmaps_pallas  # noqa: F401
