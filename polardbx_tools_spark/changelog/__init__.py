from polardbx_tools_spark.changelog.generator import (
    ChangelogSpec,
    generate_changelog,
    transcripts_schema,
)

__all__ = ["ChangelogSpec", "generate_changelog", "transcripts_schema"]
