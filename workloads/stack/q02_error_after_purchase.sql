SELECT p.user_id, count(*) AS n
FROM events p, events e
WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
  AND e.event_type = 'error'
  AND e.ts BETWEEN p.ts AND p.ts + INTERVAL 1 HOUR
GROUP BY p.user_id
