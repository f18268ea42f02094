-- Base query of the flagship report pipeline: filter the source table by
-- session-variable bounds. Rendered by graft.core.SqlTemplate: {{...}}
-- placeholders + $SESSION_VARS, with the optional incremental predicate
-- hooked into {{AND_CONDITION}}.
SELECT event_type, user_id, value, ts
FROM {{SOURCE_TABLE}}
WHERE value BETWEEN $MIN_VALUE AND $MAX_VALUE {{AND_CONDITION}}
