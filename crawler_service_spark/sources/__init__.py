from .pages import read_pages, scan_report

__all__ = ["read_pages", "scan_report"]
