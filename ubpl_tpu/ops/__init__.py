from . import transforms, heatmap, pck, features, augment  # noqa: F401
