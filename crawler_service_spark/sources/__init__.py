from .pages import read_pages, scan_report
from .listings import box_listing_to_candidates, drive_listing_to_candidates, split_frontier_and_files
from .results import fetch_extraction_jobs

__all__ = ["read_pages", "scan_report", "fetch_extraction_jobs",
           "drive_listing_to_candidates", "box_listing_to_candidates", "split_frontier_and_files"]
