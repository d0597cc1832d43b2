from .glob import glob_to_like, glob_to_regex
from .severity import SEVERITY_LABELS, severity_label_col

__all__ = ["glob_to_like", "glob_to_regex", "SEVERITY_LABELS", "severity_label_col"]
