-- Summary step: consume the detail view (ref pipeline step 3 is literally
-- SELECT * over the step-2 view).
SELECT * FROM {{DETAIL_VIEW}} ORDER BY event_type
