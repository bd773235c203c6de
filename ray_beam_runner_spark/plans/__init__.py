"""Plan inspection and differential-testing utilities."""
