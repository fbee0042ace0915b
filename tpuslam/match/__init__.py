"""Scan matchers: ICP, PL-ICP, hector GN, karto correlative."""
