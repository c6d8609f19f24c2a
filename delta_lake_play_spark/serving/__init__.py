"""Serving facade reproducing the reference's five HTTP endpoints
(``api.py:55-107``) over the versioned table layer."""
