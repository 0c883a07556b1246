from .sections import AnalysisSection  # noqa: F401
