from .builder import LevelGeometry, build_domain, setup_case, should_use_bouzidi

__all__ = ["LevelGeometry", "build_domain", "setup_case", "should_use_bouzidi"]
