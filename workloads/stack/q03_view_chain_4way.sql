SELECT count(*) AS n
FROM events s, events v1, events v2, events p
WHERE s.user_id = v1.user_id AND v1.user_id = v2.user_id
  AND v2.user_id = p.user_id
  AND s.event_type = 'signup' AND v1.event_type = 'view'
  AND v2.event_type = 'view' AND p.event_type = 'purchase'
  AND s.ts < v1.ts AND v1.ts < v2.ts AND v2.ts < p.ts
