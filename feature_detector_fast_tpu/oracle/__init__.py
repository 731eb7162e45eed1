"""Differential-test oracles (the reference's `opencv_compat` role)."""
