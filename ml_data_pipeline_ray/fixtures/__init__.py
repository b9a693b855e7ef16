from .transcripts import (  # noqa: F401
    SCALES,
    gen_changelog,
    gen_transcripts,
    write_fixture_set,
    ensure_fixture_set,
)
