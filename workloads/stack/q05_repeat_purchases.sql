SELECT p1.user_id, count(*) AS n,
       round(sum(p2.value), 2) AS repeat_value
FROM events p1, events p2
WHERE p1.user_id = p2.user_id AND p1.event_type = 'purchase'
  AND p2.event_type = 'purchase' AND p2.ts > p1.ts AND p1.value > 50
GROUP BY p1.user_id
