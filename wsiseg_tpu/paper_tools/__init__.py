"""Analysis/paper tools — twins of reference ``paper_tools/*.py``."""
