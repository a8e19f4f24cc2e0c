from .testdata import load_table, load_all  # noqa: F401
from .pages import pages_df, gazetteer_df  # noqa: F401
