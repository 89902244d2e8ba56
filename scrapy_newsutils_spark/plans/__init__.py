from .epoch import CrawlEngine  # noqa: F401
