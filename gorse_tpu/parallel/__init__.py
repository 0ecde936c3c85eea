from .mesh import make_mesh, mf_shardings

__all__ = ["make_mesh", "mf_shardings"]
