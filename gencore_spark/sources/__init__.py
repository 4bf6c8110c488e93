from .tables import TableIO, load_testdata

__all__ = ["TableIO", "load_testdata"]
