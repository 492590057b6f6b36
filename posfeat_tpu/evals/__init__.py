"""Downstream evaluation harnesses: HPatches MMA, Aachen Day-Night
localization, ETH SfM local-feature benchmark."""
