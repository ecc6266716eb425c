from .repos import RepoFixture, make_fixture  # noqa: F401
