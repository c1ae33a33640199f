"""DataFrame operators re-expressing the reference's capabilities
(SURVEY.md §2). Each module cites the reference file:line it derives
semantics from; execution is idiomatic Spark throughout."""
