"""Shared constants for the DeepBook margin models (reference ``README.md:139``)."""

PACKAGE = "0x97d9473771b01f77b0940c589484184b49f6444627ec121314fae6a6d36fb86b"
