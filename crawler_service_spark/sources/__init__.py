from .pages import read_pages, scan_report
from .results import fetch_extraction_jobs

__all__ = ["read_pages", "scan_report", "fetch_extraction_jobs"]
