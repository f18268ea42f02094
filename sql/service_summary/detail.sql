-- Detail step: aggregate the base VIEW (view reuse, ref pipeline step 2).
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM {{BASE_VIEW}}
GROUP BY event_type
